# checkpoint.py — Orbax checkpointing with the reference's directory contract.
#
# Rebuild of the reference checkpoint/resume subsystem (SURVEY.md §5):
# Lightning ModelCheckpoint x2 — `last` every epoch + best-1 on
# val_macro_dice(max) (reference train.py:1430-1448) — with auto-resume from
# `last` (train.py:504-509, 1509-1516). Layout:
#   CHECKPOINT_DIR/<variant>/seed<k>/last/    (step/epoch/state)
#   CHECKPOINT_DIR/<variant>/seed<k>/best/
#   CHECKPOINT_DIR/<variant>/seed<k>/meta.json   (epoch, best metric, lr)
from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def seed_dir(ckpt_root, variant: str, seed: int) -> Path:
    return Path(ckpt_root) / variant / f"seed{seed}"


class CheckpointManager:
    """last + best checkpoints for one (variant, seed) run."""

    def __init__(self, directory):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    # ── save ───────────────────────────────────────────────────
    def save(self, kind: str, state_tree: Dict[str, Any], meta: Dict[str, Any]):
        path = self.dir / kind
        tmp = self.dir / f".{kind}.tmp"
        if tmp.exists():
            shutil.rmtree(tmp)
        self._ckptr.save(tmp, state_tree)
        if path.exists():
            shutil.rmtree(path)
        tmp.rename(path)
        meta_all = self._read_meta()
        meta_all[kind] = meta
        (self.dir / "meta.json").write_text(json.dumps(meta_all, indent=2))

    # ── restore ────────────────────────────────────────────────
    def _read_meta(self) -> Dict[str, Any]:
        p = self.dir / "meta.json"
        if p.exists():
            try:
                return json.loads(p.read_text())
            except json.JSONDecodeError:
                return {}
        return {}

    def has(self, kind: str) -> bool:
        return (self.dir / kind).exists()

    def restore(self, kind: str, template: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Restore a state tree shaped like `template`; returns (state, meta).

        A template with fewer keys than the checkpoint (e.g. params-only for
        inference, no opt_state) restores partially — the equivalent of the
        reference's prefix-realigned state_dict fallback (test.py:548-579).
        """
        # top-level None entries (e.g. batch_stats for norm-free models,
        # opt_state for inference-only restores) are stripped for orbax and
        # reattached afterwards
        nones = {k for k, v in template.items() if v is None}
        trimmed = {k: v for k, v in template.items() if v is not None}
        try:
            restored = self._ckptr.restore(self.dir / kind, item=trimmed)
        except ValueError:
            restored = self._ckptr.restore(
                self.dir / kind, item=trimmed, partial_restore=True)
        for k in nones:
            restored[k] = None
        return restored, self._read_meta().get(kind, {})

    def resume_kind(self) -> Optional[str]:
        """Auto-resume policy (reference _resolve_resume_ckpt,
        train.py:504-509): prefer `last`, else newest available (`best`)."""
        if self.has("last"):
            return "last"
        if self.has("best"):
            return "best"
        return None
