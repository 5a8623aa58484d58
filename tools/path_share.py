"""Refine-path share of the bench suite (round-5 directive 8 evidence).

Runs bench.py with SPARK_GRAFT_PATH_STATS=1 and aggregates the PATHSTATS
stderr lines: for every query, which refine implementation each
sjoin_pairs call compiled to (jvm_* = whole-stage-codegen SQL, kernel_* =
Arrow/numpy mapInPandas) and how many seconds the query spent.  The
"kernel family weight" — the share of suite seconds in queries that
still touch an Arrow refine kernel — is the number VERDICT r4 directive
8 asks for.

Usage: python tools/path_share.py [sf_dir]   (default /root/testdata/sf0.1)
Appends the summary to BENCH/PATH_SHARE.md.
"""

from __future__ import annotations

import ast
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "PATH_SHARE.md")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    env = {**os.environ, "SPARK_GRAFT_PATH_STATS": "1",
           "SPARK_GRAFT_SF_DIR": sf_dir,
           "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "32")}
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, capture_output=True, text=True, timeout=3600)
    rows = []
    pat = re.compile(r"PATHSTATS (\S+) ([0-9.]+)s (\{.*\})")
    for line in p.stderr.splitlines():
        m = pat.search(line)
        if m:
            rows.append((m.group(1), float(m.group(2)),
                         ast.literal_eval(m.group(3))))
    if not rows:
        print("no PATHSTATS lines captured; stderr tail:")
        print("\n".join(p.stderr.splitlines()[-10:]))
        sys.exit(1)

    total = sum(s for _, s, _ in rows)
    kernel_sec = sum(s for _, s, st in rows
                     if any(k.startswith("kernel") for k in st))
    lines = [f"\n## path share @ {sf_dir} "
             f"(cpus={env['SPARK_GRAFT_CPUS']})\n",
             "| query | sec | refine paths |", "|---|---|---|"]
    for name, sec, st in rows:
        paths = ", ".join(f"{k}x{v}" for k, v in sorted(st.items())) or "-"
        lines.append(f"| {name} | {sec:.2f} | {paths} |")
    lines.append(f"\nsuite {total:.1f}s; queries touching an Arrow refine "
                 f"kernel: {kernel_sec:.1f}s ({100*kernel_sec/total:.0f}% "
                 "of suite seconds)")
    text = "\n".join(lines) + "\n"
    print(text)
    with open(OUT, "a") as f:
        f.write(text)


if __name__ == "__main__":
    main()
