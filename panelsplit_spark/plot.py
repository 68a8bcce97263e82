"""Fold visualization (reference /root/reference/panelsplit/plot.py:6-66).

The fold spec is driver-small regardless of data scale, so plotting is
identical to the reference: one horizontal line per fold, train periods
in blue, test periods in red. matplotlib is optional (gated import)."""

from __future__ import annotations

from typing import Any


def plot_splits(panel_split: Any, show: bool = True):
    """Scatter the train/test period sets of each fold.

    Accepts a ``panelsplit_spark.PanelSplit`` (uses its driver-held
    ``_u_periods_cv``). Returns the matplotlib figure.
    """
    try:
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt
    except Exception as e:  # pragma: no cover
        raise ImportError(
            "plot_splits requires matplotlib, which is not installed"
        ) from e

    u_periods_cv = panel_split._u_periods_cv
    fig, ax = plt.subplots(figsize=(8, max(2, len(u_periods_cv) * 0.6)))
    for i, (train_p, test_p) in enumerate(u_periods_cv):
        ax.scatter(
            list(train_p), [i] * len(train_p),
            color="tab:blue", marker="s", s=12,
            label="train" if i == 0 else None,
        )
        ax.scatter(
            list(test_p), [i] * len(test_p),
            color="tab:red", marker="s", s=12,
            label="test" if i == 0 else None,
        )
    ax.set_yticks(range(len(u_periods_cv)))
    ax.set_yticklabels([f"split {i}" for i in range(len(u_periods_cv))])
    ax.set_xlabel("period")
    ax.legend(loc="upper left")
    fig.tight_layout()
    if show:  # pragma: no cover
        plt.show()
    return fig
