"""Orbax checkpointing of {params, opt_state, ema_params, step, epoch}.

Reference format: torch.save([state_dict, optim, epoch, step, ema]) rewritten
every 1000 steps plus numbered checkpoint_{step}.pt at snapshot_freq
(ncsn_runner.py:424-439). Same policy here: a rolling "checkpoint" plus
numbered "checkpoint_{step}" directories, Orbax-native.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state: TrainState, name: str = "checkpoint") -> str:
    path = os.path.join(os.path.abspath(ckpt_dir), name)
    ckptr = _checkpointer()
    if jax.process_count() > 1:
        # Collective save: EVERY process must call this (orbax synchronizes
        # across processes and only the primary host writes replicated
        # arrays) — a process-0-only call would deadlock on the barrier.
        ckptr.save(path, state, force=True)
    else:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def load_checkpoint(ckpt_dir: str, name: str = "checkpoint",
                    target: Optional[TrainState] = None) -> TrainState:
    path = os.path.join(os.path.abspath(ckpt_dir), name)
    ckptr = _checkpointer()
    restored = ckptr.restore(path, item=target)
    if target is not None and not isinstance(restored, TrainState):
        restored = TrainState(**restored)
    return restored


def latest_numbered_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for d in os.listdir(ckpt_dir):
        if d.startswith("checkpoint_"):
            try:
                steps.append(int(d.split("_")[1]))
            except ValueError:
                pass
    return max(steps) if steps else None
