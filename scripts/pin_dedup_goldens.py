"""Pin near-dedup operator outputs as regression goldens.

Run ONCE against a known-good implementation (first pinned from the round-1
driver-side implementation, commit 0c8fdcf) to freeze the expected
(doc_id, cluster/group) assignments and verified pair lists; the
distributed rewrite must reproduce them byte-for-byte.

Regenerate only if the operator *semantics* (hash family, banding, tau)
intentionally change:  python scripts/pin_dedup_goldens.py
"""

from __future__ import annotations

import os
import sys

import ray
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from case_uco_ontology_map_ray.ops import dedup as dd  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "goldens", "dedup")


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for sf in ("sf0.001", "sf0.01"):
        docs = rd.read_parquet(f"/root/testdata/{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        mh = dd.minhash_lsh_dedup(docs)
        sh = dd.simhash_groups(docs)
        ng = dd.ngram_jaccard_pairs(docs)
        mh.to_csv(f"{GOLDEN_DIR}/minhash_{sf}.csv", index=False)
        sh.to_csv(f"{GOLDEN_DIR}/simhash_{sf}.csv", index=False)
        ng.to_csv(f"{GOLDEN_DIR}/ngram_{sf}.csv", index=False)
        print(sf, "minhash", len(mh), "clusters",
              mh[mh.doc_id != mh.cluster_id].shape[0], "non-singleton docs;",
              "simhash", sh[sh.doc_id != sh.group_id].shape[0],
              "; ngram pairs", len(ng))
    ray.shutdown()


if __name__ == "__main__":
    main()
