from gastx.eval.metrics import (
    mpjpe,
    weighted_mpjpe,
    p_mpjpe,
    n_mpjpe,
    euclidean_losses,
    pck,
    auc,
)

__all__ = [
    "mpjpe",
    "weighted_mpjpe",
    "p_mpjpe",
    "n_mpjpe",
    "euclidean_losses",
    "pck",
    "auc",
]
