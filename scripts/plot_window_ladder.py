"""Educational diagram of the log-depth doubling-window ladder.

The analog of the reference's van Herk stair diagram
(Morphology/plot_stair.py:5-100): where the CUDA build explains ksz-aligned
prefix/suffix scans, the TPU build's window engine (kernels/window.py) builds
power-of-two partial reductions by doubling and combines them — overlapping
spans for idempotent min/max, disjoint binary-decomposition spans for sums.
This renders both combinations for a 17-tap window into
docs/window_ladder.png.

Run: python scripts/plot_window_ladder.py
"""

import sys

sys.path.insert(0, "/root/repo")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# one-hue sequential ramp (light -> dark = ladder depth); labels carry
# identity in ink, not color
RAMP = ["#c7dbef", "#9ecae1", "#6baed6", "#3182bd", "#08519c"]
INK, MUTED = "#1f2933", "#616e7c"

KSZ = 17


def draw_ladder(ax):
    """Ladder build: P_{2p}[i] = f(P_p[i], P_p[i+p])."""
    levels = [1, 2, 4, 8, 16]
    for row, p in enumerate(levels):
        y = len(levels) - 1 - row
        for i in range(0, 24, max(p, 1)):
            ax.barh(y, p - 0.15, left=i, height=0.55, color=RAMP[row],
                    edgecolor="white", linewidth=0.8)
        ax.text(33.6, y, f"P{p}: spans of {p}", va="center", fontsize=9,
                color=INK)
    ax.set_title(
        "1. Doubling ladder: each level fuses two shifted copies of the "
        "previous one\n(log2 steps, full-vector VPU ops)", fontsize=10,
        loc="left", color=INK)


def draw_combine(ax):
    """Window combine for ksz=17."""
    # sum: binary decomposition 17 = 16 + 1, spans laid end to end
    ax.barh(2, 16 - 0.1, left=0, height=0.5, color=RAMP[4],
            edgecolor="white")
    ax.barh(2, 1 - 0.1, left=16, height=0.5, color=RAMP[1],
            edgecolor="white")
    ax.text(33.6, 2, "sum: P16[0] + P1[16]  (disjoint)", va="center",
            fontsize=9, color=INK)
    # extreme: two overlapping P16 spans
    ax.barh(1, 16 - 0.1, left=0, height=0.5, color=RAMP[3],
            edgecolor="white")
    ax.barh(0.35, 16 - 0.1, left=1, height=0.5, color=RAMP[2],
            edgecolor="white")
    ax.text(33.6, 0.7, "min/max: f(P16[0], P16[1])  (overlap is harmless —\n"
            "idempotent), any ksz in O(log ksz)", va="center", fontsize=9,
            color=INK)
    ax.axvline(0, color=MUTED, linewidth=0.8)
    ax.axvline(KSZ, color=MUTED, linewidth=0.8, linestyle="--")
    ax.text(KSZ, 2.9, f"window = {KSZ} taps", ha="center", fontsize=9,
            color=MUTED)
    ax.set_title(
        "2. Window combine (ksz = 17): 5 vector ops total vs 16 "
        "tap-by-tap adds", fontsize=10, loc="left", color=INK)


def main():
    fig, axes = plt.subplots(2, 1, figsize=(9.2, 5.4), height_ratios=[5, 3])
    for ax in axes:
        ax.set_xlim(-0.5, 46)
        ax.set_yticks([])
        ax.spines[["left", "top", "right"]].set_visible(False)
        ax.tick_params(colors=MUTED, labelsize=8)
        ax.set_xlabel("pixel offset", fontsize=8, color=MUTED)
    draw_ladder(axes[0])
    axes[0].set_ylim(-0.6, 5.0)
    draw_combine(axes[1])
    axes[1].set_ylim(-0.1, 3.4)
    fig.suptitle("kernels/window.py: log-depth sliding-window reductions "
                 "(van Herk/Gil-Werman collapsed to O(log k))",
                 fontsize=11, color=INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    fig.savefig("docs/window_ladder.png", dpi=140)
    print("wrote docs/window_ladder.png")


if __name__ == "__main__":
    main()
