#!/usr/bin/env python
"""Constraint-activation clustering over a generated Frenet table
(reference scripts/nmpc_constraint_regions.ipynb workflow): rank unique
active-constraint patterns, write warm-start centers + cluster-id npz
artifacts next to the table."""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from irbfn_tpu.train.clustering import (save_cluster_artifacts,
                                        unique_activation_patterns)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--npz_path", type=str, required=True)
    p.add_argument("--top_k", type=int, default=499)
    args = p.parse_args()

    data = np.load(args.npz_path)
    inputs, constraints = data["inputs"], data["constraints"]
    pats, counts, _ = unique_activation_patterns(constraints)
    print(f"{pats.shape[0]} unique activation patterns; "
          f"top 5 cover {counts[:5].sum() / counts.sum():.1%}")
    centers_path, ids_path = save_cluster_artifacts(
        args.npz_path, inputs, constraints, args.top_k)
    print(f"saved {centers_path}\nsaved {ids_path}")


if __name__ == "__main__":
    main()
