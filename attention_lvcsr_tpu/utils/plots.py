"""Alignment heat-map plots (lvsr/notebook.py:81-94 role)."""
from __future__ import annotations

import numpy as np


def save_alignment(weights, labels, path, bos_symbol=False):
    """Save an attention-alignment heatmap.

    ``weights``: (T_out, L) alignment matrix; ``labels``: decoded symbols
    for the y axis.
    """
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot

    weights = np.asarray(weights)
    fig, ax = pyplot.subplots(figsize=(10, max(3, len(labels) * 0.25)))
    ax.imshow(weights, aspect="auto", interpolation="nearest",
              cmap="viridis")
    labels_shown = ([""] + list(labels)) if bos_symbol else list(labels)
    ax.set_yticks(range(len(labels_shown)))
    ax.set_yticklabels(labels_shown, fontsize=6)
    ax.set_xlabel("encoded frames")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    pyplot.close(fig)
