"""Data-size scaling evidence: the identical full dedup pipeline at a FIXED
cluster size (local[16] = the measured saturation point of this 32-core
host) on a corpus and on 4x that corpus. Complements the N->4N core-count
curve in BENCH/BASELINE.md: the north rule's 10^12-doc claim needs both
"more executors -> proportionally faster" AND "more data -> proportionally
more work, no superlinear blowup" (the LSH pair stage is the quadratic
risk; bucket_cap bounds it by construction, this run measures it).

Usage: python scripts/scaling_data.py [n_base] (default 300000 -> 1.11M
docs, then 4*n_base -> 4.44M docs). Appends results to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _pipeline_docs_per_sec, ensure_corpus

MASTER = os.environ.get("SCALING_DATA_MASTER", "local[16]")


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    results = []
    for nb, parts in ((n_base, 256), (4 * n_base, 1024)):
        corpus = ensure_corpus(nb)
        r = _pipeline_docs_per_sec(MASTER, corpus, parts)
        r["n_base"] = nb
        r["shuffle_partitions"] = parts
        results.append(r)
        print(json.dumps(r), flush=True)
        with open(f"BENCH/scaling_data_{nb}.json", "w") as fh:
            json.dump(r, fh)

    r1, r4 = results
    ratio = round(r4["docs_per_sec"] / r1["docs_per_sec"], 3)
    with open("BENCH/BASELINE.md", "a") as fh:
        fh.write(
            f"\n## Data-size scaling ({MASTER} fixed), corpus {r1['n_docs']} vs {r4['n_docs']} docs\n\n"
            "Identical pipeline (SCALE_CONFIG) and cluster size; only the corpus\n"
            "grows 4x (shuffle partitions sized by data: 256 -> 1024):\n\n"
            "| corpus docs | wall sec | docs/sec | stage sec (sig/verify/cc) |\n|---|---|---|---|\n"
            + "".join(
                f"| {r['n_docs']} | {r['wall_sec']} | {r['docs_per_sec']} | "
                f"{r['stage_sec']['signatures']} / {r['stage_sec']['pairs_verify']} / {r['stage_sec']['cc_clusters']} |\n"
                for r in results
            )
            + f"\n**Throughput retention at 4x data = {r4['docs_per_sec']} / {r1['docs_per_sec']} "
            f"= {ratio}** (1.0 = perfectly linear in data; the LSH/verify stages'\n"
            "pair volume is bounded per-bucket by bucket_cap, so work grows ~linearly\n"
            "with docs, not quadratically).\n"
        )
    print(json.dumps({"throughput_retention_4x_data": ratio}))


if __name__ == "__main__":
    main()
