"""Pin near-dedup operator outputs as regression goldens.

History of intentional regenerations:
- round 2 (simhash only): round 1 ran ``DataFrame.to_numpy()`` over mixed
  dtypes (int64 doc_id + uint64 simhash), silently casting the 64-bit
  fingerprints to float64 and zeroing their low ~11 bits before the hamming
  comparison. Round 2 computes hamming on exact uint64 (vectorized
  byte-table popcount, unit-tested against ``bin(x).count('1')``).
- round 3 (all): the shingle/band hash family moved from one blake2b call
  per shingle/band to the whole-batch vectorized polynomial family
  (functions/hashing.py) — ~60% of round-2 sketch time was blake2b
  dispatch. Hash VALUES change, so clusterings at the LSH margin differ;
  the kernel semantics are pinned independently in
  tests/test_hashing_kernels.py (pure-Python big-int oracle) and
  tests/test_dedup_goldens.py (brute-force simhash grouping oracle),
  so the goldens only guard against unintentional drift.

Regenerate only if the operator *semantics* (hash family, banding, tau)
intentionally change:  python scripts/pin_dedup_goldens.py
"""

from __future__ import annotations

import os
import sys

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from case_uco_ontology_map_ray.pipelines import corpus  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "goldens", "dedup")


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for sf in ("sf0.001", "sf0.01"):
        sf_dir = f"/root/testdata/{sf}"
        mh = corpus.dedup_minhash_documents(sf_dir)
        sh = corpus.dedup_simhash_documents(sf_dir)
        ng = corpus.ngram_jaccard_pairs(sf_dir)
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
