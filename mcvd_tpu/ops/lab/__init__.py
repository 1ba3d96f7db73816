"""The kernel lab: complete, parity-tested Pallas kernels that LOST their
end-to-end shoot-outs against XLA on every shipped shape class (ngf
64/96/128/192 — ops/README.md decision record, BENCH_NOTES.md tables) and
are therefore OFF the production paths.

They stay in-tree, clearly bounded here, because (a) they keep CI coverage
over the Pallas toolchain, (b) the shoot-out harnesses
(tools/profile_attn.py, tools/bench_big.py --shootout) re-evaluate them per
shape class and flipping one on is a one-line `ops.set_use_pallas` call if
a future config moves the crossover, and (c) they document the hardware
reasoning (block shapes, VMEM budgets, relayout costs) for the next kernel
that IS needed. Nothing in mcvd_tpu imports this package on a default
(pallas-off) run except through the `ops.set_use_pallas(True)` switch.
"""

from . import attention, groupnorm, winograd

__all__ = ["attention", "groupnorm", "winograd"]
