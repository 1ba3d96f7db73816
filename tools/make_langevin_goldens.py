#!/usr/bin/env python
"""Generate torch-oracle trajectory goldens for the specialty Langevin
samplers by RUNNING the reference implementations (VERDICT r3 next #6).

Reference functions exercised (from /root/reference/models/__init__.py):
  - anneal_Langevin_dynamics_inpainting   (:680-716)
  - anneal_Langevin_dynamics_interpolation (:719-771)
  - sparse_anneal_Langevin_dynamics        (:413-483)
  - sparse_anneal_Langevin_dynamics_consistent (:581-677)

torch.randn/randn_like are monkeypatched to a seeded numpy stream and every
draw is RECORDED in order, so the jax implementations can replay the exact
noise sequence (their `noises` injection seam) and be compared trajectory-
for-trajectory. A tiny closed-form fake scorenet (shared formula with the
test) stands in for the network. Output: tests/golden/langevin_extras.npz.
"""

import os
import sys

import numpy as np

REF = os.environ.get("MCVD_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

L = 4            # sigma levels
NSTEP = 2        # n_steps_each
B, H, W, C = 2, 8, 8, 3   # reference inpainting hardcodes 3 channels
SIGMA_BEGIN, SIGMA_END = 1.0, 0.01
STEP_LR = 1e-5
STEP_LR_CONSISTENT = 1e-4   # must sit in the consistent-sampler SNR window
N_INTERP = 3
SPARSITY = 2.0


def fake_eps_np(x, s):
    """Closed-form stand-in scorenet, shared with the jax test: bounded,
    sigma-dependent, nonlinear. x: array; s: per-example sigma (B,)."""
    sb = s.reshape((-1,) + (1,) * (x.ndim - 1))
    return -0.5 * x / (1.0 + sb) + 0.05 * np.sin(3.0 * x)


def main():
    sys.path.insert(0, REF)
    import torch

    import models as ref_models

    sigmas = np.geomspace(SIGMA_BEGIN, SIGMA_END, L).astype(np.float32)

    class FakeScore:
        """Mimics the reference scorenet surface these samplers need:
        .sigmas, call(x, y[, cond, y_is_label])."""

        def __init__(self):
            self.sigmas = torch.from_numpy(sigmas)

        def __call__(self, x, y, cond=None, y_is_label=True):
            if y_is_label:
                s = self.sigmas[y.long()]
            else:
                s = y.reshape(-1)
            out = fake_eps_np(x.numpy(), s.numpy().astype(np.float32))
            return torch.from_numpy(out.astype(np.float32))

    rec = []
    rng = np.random.RandomState(7)

    def fake_randn(*shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        a = rng.standard_normal(shape).astype(np.float32)
        rec.append(a)
        return torch.from_numpy(a)

    def fake_randn_like(t, **kw):
        return fake_randn(*tuple(t.shape))

    torch.randn = fake_randn
    torch.randn_like = fake_randn_like

    net = FakeScore()
    out = {"sigmas": sigmas}
    rs = np.random.RandomState(3)

    def record(tag, fn):
        rec.clear()
        traj = fn()
        out[f"{tag}::traj"] = traj.numpy().astype(np.float32)
        for i, n in enumerate(rec):
            out[f"{tag}::noise{i:04d}"] = n
        out[f"{tag}::n_noise"] = np.int64(len(rec))
        print(f"{tag}: traj {tuple(traj.shape)}, {len(rec)} noise draws")

    # ---- inpainting: x_mod (B, n_samples=1, 3, H, W); refer (B, 3, H, W)
    x0_inp = rs.standard_normal((B, 1, C, H, W)).astype(np.float32)
    refer = rs.standard_normal((B, C, H, W)).astype(np.float32)
    out["inpainting::x0"] = x0_inp
    out["inpainting::refer"] = refer
    record("inpainting", lambda: ref_models.anneal_Langevin_dynamics_inpainting(
        torch.from_numpy(x0_inp.copy()), torch.from_numpy(refer.copy()), net,
        image_size=H, n_steps_each=NSTEP, step_lr=STEP_LR))

    # ---- interpolation: x_mod (B, C, H, W)
    x0 = rs.standard_normal((B, C, H, W)).astype(np.float32)
    out["interpolation::x0"] = x0
    record("interpolation",
           lambda: ref_models.anneal_Langevin_dynamics_interpolation(
               torch.from_numpy(x0.copy()), net, N_INTERP,
               n_steps_each=NSTEP, step_lr=STEP_LR, final_only=False))

    # ---- sparse
    x0_sp = rs.standard_normal((B, C, H, W)).astype(np.float32)
    out["sparse::x0"] = x0_sp
    record("sparse", lambda: ref_models.sparse_anneal_Langevin_dynamics(
        torch.from_numpy(x0_sp.copy()), SPARSITY, net,
        n_steps_each=NSTEP, step_lr=STEP_LR, final_only=False, denoise=True))

    # ---- sparse consistent. NB upstream CPU aliasing quirk: the loop
    # appends `x_mod.to('cpu')` (same object on CPU) and then updates x_mod
    # IN PLACE (+=), so rows 0..T-1 of the returned stack all alias the
    # final pre-denoise dense state; only the denoise row is distinct. The
    # test pins exactly that.
    record("sparse_consistent",
           lambda: ref_models.sparse_anneal_Langevin_dynamics_consistent(
               torch.from_numpy(x0_sp.copy()), SPARSITY, net,
               n_steps_each=NSTEP, step_lr=STEP_LR_CONSISTENT,
               final_only=False, denoise=True))

    # the sparse ITERATE itself is only returned by final_only=True
    record("sparse_consistent_final",
           lambda: ref_models.sparse_anneal_Langevin_dynamics_consistent(
               torch.from_numpy(x0_sp.copy()), SPARSITY, net,
               n_steps_each=NSTEP, step_lr=STEP_LR_CONSISTENT,
               final_only=True, denoise=True))

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "langevin_extras.npz"), **out)
    print("wrote", os.path.join(OUT, "langevin_extras.npz"))


if __name__ == "__main__":
    main()
