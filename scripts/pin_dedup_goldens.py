"""Pin near-dedup operator outputs as regression goldens.

minhash/ngram goldens were pinned from the round-1 implementation (commit
0c8fdcf) and the distributed round-2 rewrite reproduces them byte-for-byte.

The simhash golden was REGENERATED from the round-2 implementation because
round 1 had a correctness bug: it ran ``DataFrame.to_numpy()`` over mixed
dtypes (int64 doc_id + uint64 simhash), silently casting the 64-bit
fingerprints to float64 and zeroing their low ~11 bits before the hamming
comparison — e.g. docs 8/12 at sf0.001 have true hamming 4 but were grouped
at radius 3. Round 2 computes hamming on exact uint64 (vectorized byte-table
popcount, unit-tested against ``bin(x).count('1')``) and links transitive
components to convergence.

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
