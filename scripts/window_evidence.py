#!/usr/bin/env python3
"""Re-derive the round-5 driver-window evidence (BENCH/WINDOW_r05.md).

Compares, at AST function-body granularity, HEAD against the round-boundary
commits (r3 = e59c2f1, r4 = 815f3d9):

  * every engine module touched in rounds 4-5 -> which *functions* changed;
  * every `_q_*` entry callable and `oracle_sql()` string -> changed or not.

A slot-51+ query is justified iff its entry callable, oracle string, and every
function it can reach are unchanged since the round of its last green
CORRECTNESS row. Run from the repo root:  python3 scripts/window_evidence.py
"""
from __future__ import annotations

import ast
import json
import os
import subprocess
import sys

sys.path.insert(0, os.getcwd())

R3, R4 = "e59c2f1", "815f3d9"

MODULES = [
    "geomesa_spark/operators/aggregations.py",
    "geomesa_spark/operators/ann.py",
    "geomesa_spark/operators/dedup.py",
    "geomesa_spark/operators/textstats.py",
    "geomesa_spark/operators/textclean.py",
    "geomesa_spark/operators/tiling.py",
    "geomesa_spark/operators/bin_export.py",
    "geomesa_spark/operators/components.py",
    "geomesa_spark/sources/convert.py",
    "geomesa_spark/sources/shapefile.py",
    "geomesa_spark/sources/warc.py",
    "geomesa_spark/geom/kernels.py",
    "geomesa_spark/streaming/dedup_stream.py",
]


def _functions(src: str) -> dict[str, str]:
    tree = ast.parse(src)
    out: dict[str, str] = {}

    def walk(node: ast.AST, prefix: str = "") -> None:
        for n in ast.iter_child_nodes(node):
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
                seg = ast.get_source_segment(src, n)
                out[prefix + n.name] = ast.dump(ast.parse(seg))
            elif isinstance(n, ast.ClassDef):
                walk(n, prefix + n.name + ".")

    walk(tree)
    return out


def _at(commit: str, path: str) -> str:
    r = subprocess.run(["git", "show", f"{commit}:{path}"],
                       capture_output=True, text=True)
    return r.stdout if r.returncode == 0 else ""


def module_diffs(base: str) -> dict[str, dict[str, list[str]]]:
    res: dict[str, dict[str, list[str]]] = {}
    for path in MODULES:
        old = _at(base, path)
        try:
            new = open(path).read()
        except FileNotFoundError:
            continue
        fo = _functions(old) if old else {}
        fn = _functions(new)
        res[path] = {
            "changed": sorted(k for k in fn if k in fo and fo[k] != fn[k]),
            "added": sorted(k for k in fn if k not in fo),
            "removed": sorted(k for k in fo if k not in fn),
        }
    return res


def entry_diffs(base: str) -> dict[str, list[str]]:
    old = _at(base, "__spark_entry__.py")
    new = open("__spark_entry__.py").read()
    fo, fn = _functions(old), _functions(new)
    q_changed = sorted(k for k in fn
                       if k.startswith("_q_") and k in fo and fo[k] != fn[k])
    q_added = sorted(k for k in fn if k.startswith("_q_") and k not in fo)

    def oracles(src: str) -> dict[str, str]:
        g: dict = {}
        exec(compile(ast.parse(src), "<entry>", "exec"), g)
        return g["oracle_sql"]()

    oo, on = oracles(old), oracles(new)
    return {
        "entry_changed": q_changed,
        "entry_added": q_added,
        "oracle_changed": sorted(k for k in on
                                 if k in oo and oo[k].strip() != on[k].strip()),
        "oracle_added": sorted(k for k in on if k not in oo),
    }


def main() -> int:
    report = {
        "since_r3": {"modules": module_diffs(R3), "entry": entry_diffs(R3)},
        "since_r4": {"modules": module_diffs(R4), "entry": entry_diffs(R4)},
    }
    json.dump(report, sys.stdout, indent=1)
    print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
