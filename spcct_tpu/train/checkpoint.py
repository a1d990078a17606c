# checkpoint.py — Orbax checkpointing with the reference's directory contract.
#
# Rebuild of the reference checkpoint/resume subsystem (SURVEY.md §5):
# Lightning ModelCheckpoint x2 — `last` every epoch + best-1 on
# val_macro_dice(max) (reference train.py:1430-1448) — with auto-resume from
# `last` (train.py:504-509, 1509-1516). Layout:
#   CHECKPOINT_DIR/<variant>/seed<k>/last/    (step/epoch/state)
#   CHECKPOINT_DIR/<variant>/seed<k>/best/
#   CHECKPOINT_DIR/<variant>/seed<k>/meta.json   (epoch, best metric, lr)
#
# Saves are ASYNCHRONOUS by default (SPCCT_ASYNC_CKPT=0 to disable): the
# device→host pull happens inline, the disk serialization runs in a
# background thread (orbax AsyncCheckpointer), and the atomic tmp→final
# rename + meta.json update are deferred until the write completes — the
# previous checkpoint of the same kind stays intact until then, so a crash
# mid-write can never lose both. The reference's Lightning saves are fully
# synchronous (~1 s per epoch on this workload, 200 epochs x 30 runs).
from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def seed_dir(ckpt_root, variant: str, seed: int) -> Path:
    return Path(ckpt_root) / variant / f"seed{seed}"


class CheckpointManager:
    """last + best checkpoints for one (variant, seed) run."""

    def __init__(self, directory, async_save: Optional[bool] = None):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        if async_save is None:
            async_save = os.getenv("SPCCT_ASYNC_CKPT", "1") != "0"
        self._async = bool(async_save)
        if self._async:
            self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        else:
            self._ckptr = ocp.PyTreeCheckpointer()
        self._pending: Dict[str, Dict[str, Any]] = {}  # kind -> meta

    # ── save ───────────────────────────────────────────────────
    def save(self, kind: str, state_tree: Dict[str, Any], meta: Dict[str, Any]):
        # finalize ALL pending saves: orbax's AsyncCheckpointer allows only
        # one in-flight save (e.g. 'best' right after 'last' in one epoch)
        self.flush()
        tmp = self.dir / f".{kind}.tmp"
        if tmp.exists():
            shutil.rmtree(tmp)
        self._ckptr.save(tmp, state_tree)  # async: returns after host pull
        self._pending[kind] = meta
        if not self._async:
            self._finalize(kind)

    def _finalize(self, kind: str):
        """Complete a pending save: wait for the background write, then
        atomically swap tmp→final and update meta.json."""
        if kind not in self._pending:
            return
        if self._async:
            self._ckptr.wait_until_finished()
        tmp = self.dir / f".{kind}.tmp"
        path = self.dir / kind
        if path.exists():
            shutil.rmtree(path)
        tmp.rename(path)
        meta_all = self._read_meta()
        meta_all[kind] = self._pending.pop(kind)
        (self.dir / "meta.json").write_text(json.dumps(meta_all, indent=2))

    def flush(self):
        """Finalize all pending async saves. Call at end of fit (and before
        any external consumer reads the checkpoint directory)."""
        for kind in list(self._pending):
            self._finalize(kind)

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
        self.flush()
        return (self.dir / kind).exists()

    def restore(self, kind: str, template: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Restore a state tree shaped like `template`; returns (state, meta).

        A template with fewer keys than the checkpoint (e.g. params-only for
        inference, no opt_state) restores partially — the equivalent of the
        reference's prefix-realigned state_dict fallback (test.py:548-579).
        """
        self.flush()
        # top-level None entries (e.g. batch_stats for norm-free models,
        # opt_state for inference-only restores) are stripped for orbax and
        # reattached afterwards
        nones = {k for k, v in template.items() if v is None}
        trimmed = {k: v for k, v in template.items() if v is not None}
        restorer = self._ckptr
        try:
            restored = restorer.restore(self.dir / kind, item=trimmed)
        except ValueError:
            restored = restorer.restore(
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
