#!/usr/bin/env python
"""Render the CompeteSMoE-vs-SMoE A/B curves (docs/science.md figure).

Reads results/r5/algo_ab_s<seed>.json (written by tools/run_algo_ab.py)
and produces one PNG with three panels:

  1. train CE loss vs step, both arms (the headline quality trajectory)
  2. matched-window validation perplexity vs step, both arms
  3. router<->affinity top-k agreement on flip steps (competesmoe only)
     — the distillation-health channel the reference never logged
     (its simple_task.py:341-352 logs loss magnitudes only)

Usage: python tools/plot_algo_ab.py [--seed 0] [--out results/r5]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
COLORS = {"competesmoe": "#4063d8", "smoe": "#cb3c33"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="results/r5")
    a = ap.parse_args()
    out_root = (REPO / a.out).resolve()
    with open(out_root / f"algo_ab_s{a.seed}.json") as f:
        r = json.load(f)

    fig, axes = plt.subplots(1, 3, figsize=(13.5, 3.6), dpi=140)
    ax_ce, ax_ppl, ax_ag = axes

    for arm, res in r["arms"].items():
        c = res["curves"]
        col = COLORS.get(arm, "#555555")
        ax_ce.plot(c["step"], c["loss_ce"], label=arm, color=col, lw=1.4)
        if c["valid_step"]:
            ax_ppl.plot(c["valid_step"], c["valid_ppl"], marker="o",
                        ms=3, label=arm, color=col, lw=1.4)
        if arm == "competesmoe" and c["agree_step"]:
            ax_ag.plot(c["agree_step"], c["agreement"], color=col,
                       lw=0.9, alpha=0.8)

    ax_ce.set(xlabel="step", ylabel="train CE loss",
              title="train loss (matched data + tokens)")
    ax_ce.legend(frameon=False)
    ax_ppl.set(xlabel="step", ylabel="valid perplexity", yscale="log",
               title="matched-window valid ppl")
    ax_ppl.legend(frameon=False)
    # chance level for top-k of E experts: E[|router∩affinity|]/k = k/E
    g = r.get("geometry", {})
    k = int(g.get("-pkm.n_heads", 8))
    n_exp = int(g.get("-moe.n_experts", 64))
    ax_ag.axhline(k / n_exp, color="#888888", lw=0.8, ls="--")
    ax_ag.text(0.02, k / n_exp + 0.02, f"chance = k/E = {k / n_exp:.3f}",
               transform=ax_ag.get_yaxis_transform(), fontsize=7,
               color="#666666")
    ax_ag.set(xlabel="step", ylabel="|router∩affinity| / k", ylim=(0, 1),
              title="router↔affinity top-k agreement (flip steps)")
    for ax in axes:
        ax.grid(True, alpha=0.25, lw=0.5)
        ax.spines[["top", "right"]].set_visible(False)

    fig.tight_layout()
    png = out_root / f"algo_ab_s{a.seed}.png"
    fig.savefig(png)
    print(f"wrote {png}")


if __name__ == "__main__":
    main()
