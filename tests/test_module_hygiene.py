"""Static guards for bug classes that type/diff checks can't see.

The LG_Q incident: a query module bound the same ALL-CAPS constant twice
(1e6 for lift/gains, 2^20 for the logistic loop). Oracle strings built at
import time froze the first value while Spark-side f-strings evaluated at
call time with the second — values provably equal per engine, hashes
divergent across them. typecheck_oracles can't see VALUE drift and the
local differential only catches it when run; this AST scan rejects the
root cause outright."""

import ast
import glob
import os

PKG = os.path.join(os.path.dirname(__file__), "..", "spark_shp")


def test_no_module_level_constant_rebinding():
    offenders = []
    for path in sorted(glob.glob(os.path.join(PKG, "queries_*.py"))):
        tree = ast.parse(open(path).read())
        seen: dict[str, int] = {}
        for node in tree.body:               # module level only
            targets = []
            if isinstance(node, ast.Assign):
                targets = [t for t in node.targets if isinstance(t, ast.Name)]
            elif isinstance(node, ast.AugAssign) and isinstance(
                    node.target, ast.Name):
                targets = [node.target]
            for t in targets:
                name = t.id
                if not name.isupper() or name.startswith("_"):
                    continue
                if name in ("QUERIES",):     # registration dict updates
                    continue
                if name in seen:
                    offenders.append(
                        f"{os.path.basename(path)}: {name} bound at lines "
                        f"{seen[name]} and {node.lineno}")
                else:
                    seen[name] = node.lineno
    assert not offenders, (
        "module-level ALL-CAPS constants rebound (oracle strings freeze "
        "the first value at import, Spark f-strings read the last): "
        + "; ".join(offenders))
