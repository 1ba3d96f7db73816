"""Winograd F(2x2, 3x3) convolution for stride-1 SAME 3x3 convs.

The NCSN++ step is conv-bound, and at ngf=64 the output-channel dimension
(64) fills only half the MXU's 128 lanes, capping direct-conv MFU. Winograd
F(2,3) computes each 2x2 output tile with 16 multiplies instead of 36 —
a 2.25x FLOP reduction — as 16 channel-space matmuls that XLA maps onto the
MXU directly; the tile transforms are +-1/+-0.5 linear combinations the VPU
handles in fused elementwise form. Measured on TPU v5e (bf16, B=16):
64x64x64->64 37us vs 72us direct; 32x32x128 21 vs 32; 16x16x192 15 vs 27.

Semantics match lax.conv SAME/stride-1 to fp32-accumulation tolerance; an
equivalence test pins both fp32 and bf16. Eval-path optimization (enabled
via ops.set_use_pallas kinds=("winograd",)); gradients flow through the jnp
ops if used in training.

Reference analog: none — the reference runs cuDNN's implicit-GEMM fp32 convs
(torch eager); this is a TPU-specific speed-of-light lever.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# F(2x2, 3x3) transform matrices (Lavin & Gray 2015)
_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


def supported(x_shape, w_shape, stride, dilation) -> bool:
    """stride-1, dilation-1 3x3 2D convs with even H, W."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    if tuple(stride) != (1, 1) or tuple(dilation) != (1, 1):
        return False
    if w_shape[0] != 3 or w_shape[1] != 3:
        return False
    return x_shape[1] % 2 == 0 and x_shape[2] % 2 == 0


def conv3x3_winograd(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,Cin) * (3,3,Cin,Cout) -> (B,H,W,Cout), SAME padding, stride 1.

    U = B^T d B per 4x4 input tile (stride 2), V = G g G^T per filter,
    M[t] = U[t] @ V[t] over channels (16 matmuls), Y = A^T M A scattered
    back into the 2x2-interleaved output grid.
    """
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    nH, nW = H // 2, W // 2

    # kernel transform in fp32 (once per call; XLA hoists it out of scan
    # loops since w is loop-invariant), then the compute dtype
    Vt = jnp.einsum("pu,uvio,qv->pqio", _G, w.astype(jnp.float32), _G)
    Vt = Vt.reshape(16, Cin, Cout).astype(x.dtype)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # d[u,v] = xp[:, u::2, v::2] cropped to (nH, nW): 16 strided views
    d = [[xp[:, u:u + 2 * nH:2, v:v + 2 * nW:2, :] for v in range(4)]
         for u in range(4)]
    # U[p,q] = sum_{u,v} BT[p,u] BT[q,v] d[u,v] — unrolled +-1 combinations
    # (XLA fuses these adds; no materialized (16,...) stack of slices)
    rows = []
    for p in range(4):
        row = []
        for v in range(4):
            acc = None
            for u in range(4):
                c = _BT[p, u]
                if c == 0:
                    continue
                term = d[u][v] if c == 1 else -d[u][v]
                acc = term if acc is None else acc + term
            row.append(acc)
        rows.append(row)
    # M[p][q] = U[p,q] @ V[p,q] without materializing a stacked (16, ...)
    # tensor: 16 independent channel-space matmuls whose inputs XLA can keep
    # as fusions over the strided slices.
    M = [[None] * 4 for _ in range(4)]
    for p in range(4):
        for q in range(4):
            acc = None
            for v in range(4):
                c = _BT[q, v]
                if c == 0:
                    continue
                term = rows[p][v] if c == 1 else -rows[p][v]
                acc = term if acc is None else acc + term
            M[p][q] = jnp.einsum(
                "bhwc,cd->bhwd", acc, Vt[4 * p + q]
            )  # (B, nH, nW, Cout)

    # Y[r,s] = sum_{p,q} AT[r,p] AT[s,q] M[p,q]
    Ys = []
    for r in range(2):
        inner = []
        for q in range(4):
            acc = None
            for p in range(4):
                c = _AT[r, p]
                if c == 0:
                    continue
                term = M[p][q] if c == 1 else -M[p][q]
                acc = term if acc is None else acc + term
            inner.append(acc)
        for ss in range(2):
            acc = None
            for q in range(4):
                c = _AT[ss, q]
                if c == 0:
                    continue
                term = inner[q] if c == 1 else -inner[q]
                acc = term if acc is None else acc + term
            Ys.append(acc)
    Y = jnp.stack(Ys).reshape(2, 2, B, nH, nW, Cout)
    out = Y.transpose(2, 3, 0, 4, 1, 5).reshape(B, H, W, Cout)
    return out
