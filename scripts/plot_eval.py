#!/usr/bin/env python
"""Plot closed-loop robustness-sweep results (reference
scripts/plot_eval_dnmpc.ipynb cells 3-7): mean |ey| and mean |epsi| vs
cornering stiffness, one line per mu -> ey_vs_cs_mu.pdf / ephi_vs_cs_mu.pdf.
"""

import argparse
import pickle
import sys

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results", type=str, required=True)
    p.add_argument("--out_prefix", type=str, default="")
    args = p.parse_args()

    with open(args.results, "rb") as f:
        data = pickle.load(f)
    combos, ey, epsi = data["combos"], data["ey"], data["epsi"]
    mus = np.unique(combos[:, 0])
    css = np.unique(combos[:, 1])

    for metric, name, fname in [(ey, "mean $|e_y|$ [m]", "ey_vs_cs_mu.pdf"),
                                (epsi, "mean $|e_\\psi|$ [rad]",
                                 "ephi_vs_cs_mu.pdf")]:
        fig, ax = plt.subplots(figsize=(6, 4))
        grid = metric.reshape(len(mus), len(css))
        for i, mu in enumerate(mus):
            ax.plot(css, grid[i], marker="o", label=f"$\\mu$={mu:.2f}")
        ax.set_xlabel("cornering stiffness")
        ax.set_ylabel(name)
        ax.legend(fontsize=8)
        fig.tight_layout()
        fig.savefig(args.out_prefix + fname)
        print(f"saved {args.out_prefix + fname}")


if __name__ == "__main__":
    main()
