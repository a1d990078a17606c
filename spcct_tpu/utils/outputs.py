# outputs.py — model-output normalization utilities.
#
# Rebuild of reference _select_main_logits (train.py:160-187): models may
# return a tensor, a (main, *aux) tuple/list (deep supervision), or a dict;
# evaluation always wants the largest-spatial-volume logits.
from __future__ import annotations

from typing import Any

import numpy as np


def _volume(x) -> int:
    return int(np.prod(x.shape[1:-1])) if hasattr(x, "shape") else -1


def select_main_logits(out: Any):
    """Normalize tensor / tuple / list / dict outputs to the main logits —
    the entry with the largest spatial volume (ties: first)."""
    if isinstance(out, dict):
        candidates = [v for v in out.values() if hasattr(v, "shape")]
    elif isinstance(out, (tuple, list)):
        candidates = [v for v in out if hasattr(v, "shape")]
    else:
        return out
    if not candidates:
        raise ValueError(f"no array-like logits in {type(out)}")
    return max(candidates, key=_volume)
