#!/usr/bin/env python
"""Certify the eval-metric weight files: one command, PASS/FAIL report.

The reference computes FVD from a downloaded TorchScript I3D
(/root/reference/models/fvd/fvd.py:30-38), FID/PR from downloaded Inception
weights (/root/reference/evaluation/fid_PR.py:324-360), and LPIPS from
torchvision AlexNet + the repo's lin heads
(/root/reference/models/eval_models.py; models/weights/v0.1/alex.pth). This
zero-egress environment can't download them, so metric VALUES printed with
the fabricated stand-ins (tools/make_eval_weights.py) are not publication
numbers. This tool is the missing closure: given the REAL files dropped into
$MCVD_WEIGHTS_DIR, it certifies that this framework's eval path computes the
same features the reference's torch stack would.

For each backbone it
  (a) loads + converts the file through the framework's own loaders,
  (b) runs a FIXED seeded batch through BOTH the JAX eval path and a live
      torch sidecar oracle (the TorchScript itself for I3D/Inception; the
      PNetLin math for LPIPS — networks_basic.py semantics, same oracle as
      tests/test_lpips.py),
  (c) compares features/distances at the stated tolerances (the same ones
      the golden tests pin: rtol 1e-3),
  (d) records sha256 + size + schema + verdict in a JSON report.

Expected filenames in $MCVD_WEIGHTS_DIR (tools/make_eval_weights.py writes
fabricated ones; drop the real files at the same names):
  i3d_torchscript.pt  — https://www.dropbox.com/s/ge9e5ujwgetktms/i3d_torchscript.pt
                        (reference models/fvd/fvd.py:30)
  inception.pt        — pt_inception-2015-12-05-6726825d.pth
                        (reference evaluation/fid_PR.py download)
  alexnet.pth         — torchvision alexnet (AlexNet_Weights.IMAGENET1K_V1)
  lpips_alex_lin.pth  — the reference's models/weights/v0.1/alex.pth
                        (shipped inside the reference repo; the fabricated
                        set copies it verbatim, so it is already real)
The report records each file's sha256 so a validated set is reproducible.

Usage:
  python tools/validate_eval_weights.py [--weights-dir DIR] [--report PATH]
                                        [--require-all]
Exit 0 iff every backbone that is present PASSes (--require-all also fails
on missing files).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# feature tolerance: matches the golden oracle tests (tests/test_i3d.py:61,
# tests/test_lpips.py:79). The two sides share weights but not resize
# kernels (jax.image.resize vs torch F.interpolate, both align_corners
# =False), so exact equality is not expected.
RTOL, ATOL = 1e-3, 2e-3


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _compare(name, jax_feats, torch_feats, results, extra=None):
    jax_feats = np.asarray(jax_feats, np.float64)
    torch_feats = np.asarray(torch_feats, np.float64)
    abs_diff = np.abs(jax_feats - torch_feats)
    denom = np.abs(torch_feats)
    ok = bool(np.all(abs_diff <= ATOL + RTOL * denom))
    na = jax_feats / (np.linalg.norm(jax_feats, axis=-1, keepdims=True) + 1e-12)
    nb = torch_feats / (np.linalg.norm(torch_feats, axis=-1, keepdims=True) + 1e-12)
    cos_min = float(np.min(np.sum(na * nb, axis=-1)))
    entry = {
        "status": "PASS" if ok else "FAIL",
        "max_abs_diff": float(abs_diff.max()),
        "max_rel_diff": float((abs_diff / np.maximum(denom, 1e-6)).max()),
        "min_feature_cosine": cos_min,
        "feature_shape": list(jax_feats.shape),
        "rtol": RTOL,
        "atol": ATOL,
    }
    if extra:
        entry.update(extra)
    results.setdefault(name, {}).update(entry)
    return ok


def validate_i3d(path, results):
    """JAX flax I3D (BN-folded port, eval/i3d.py) vs the TorchScript itself
    run through the reference protocol sidecar (eval/fvd.py)."""
    from mcvd_tpu.eval.fid import calculate_frechet_distance, activation_statistics
    from mcvd_tpu.eval.fvd import make_i3d_embedder
    from mcvd_tpu.eval.i3d import make_jax_i3d_embedder

    rng = np.random.RandomState(20260818)
    # non-square frames exercise the shortest-side resize + center crop
    videos = rng.rand(8, 16, 72, 96, 3).astype(np.float32)

    torch_feats = make_i3d_embedder(path, batch_size=4)(videos)
    jax_feats = make_jax_i3d_embedder(path, batch_size=4)(videos)
    # derived-scalar check: FVD between the two halves, both feature sets
    fvd = []
    for feats in (torch_feats, jax_feats):
        mu1, s1 = activation_statistics(feats[:4])
        mu2, s2 = activation_statistics(feats[4:])
        fvd.append(calculate_frechet_distance(mu1, s1, mu2, s2))
    rel = abs(fvd[0] - fvd[1]) / max(abs(fvd[0]), 1e-9)
    ok = _compare("i3d", jax_feats, torch_feats, results,
                  extra={"fvd_torch": fvd[0], "fvd_jax": fvd[1],
                         "fvd_rel_diff": rel})
    return ok and rel < 1e-2


def validate_inception(path, results):
    """JAX simple-schema embedder vs the TorchScript sidecar (eval/fid.py).
    A full InceptionV3 TorchScript has no JAX conversion (by design — the
    runner uses the torch sidecar, runner.py:906); then the certificate is
    load+run+finite with the schema recorded."""
    from mcvd_tpu.eval.fid import make_inception_embedder
    from mcvd_tpu.eval.i3d import make_jax_inception_embedder

    rng = np.random.RandomState(20260819)
    images = rng.rand(16, 64, 64, 3).astype(np.float32)

    torch_feats = make_inception_embedder(path, batch_size=8)(images)
    if not np.all(np.isfinite(torch_feats)):
        results["inception"].update({"status": "FAIL",
                                     "error": "non-finite torch features"})
        return False
    try:
        jax_feats = make_jax_inception_embedder(path, batch_size=8)(images)
    except ValueError:
        results["inception"].update({
            "status": "PASS",
            "schema": "torch-sidecar-only (full InceptionV3)",
            "feature_shape": list(torch_feats.shape),
            "note": "runner uses the torch sidecar for this schema "
                    "(runner.py:906); sidecar loads and yields finite "
                    "features — it IS the reference implementation",
        })
        return True
    results["inception"]["schema"] = "simple2d (jax-converted)"
    return _compare("inception", jax_feats, torch_feats, results)


def validate_lpips(lin_path, alex_path, results):
    """JAX LPIPSAlex with converted file weights vs the PNetLin torch math
    (reference models/networks_basic.py; oracle form of tests/test_lpips.py)
    on identical pre-resized [-1,1] inputs."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from mcvd_tpu.eval.lpips import LPIPSAlex, convert_lpips_weights

    lin_sd = torch.load(lin_path, map_location="cpu", weights_only=False)
    alex_sd = torch.load(alex_path, map_location="cpu", weights_only=False)
    if hasattr(alex_sd, "state_dict"):
        alex_sd = alex_sd.state_dict()
    params = convert_lpips_weights(alex_sd, lin_sd)

    rng = np.random.RandomState(20260820)
    a = (rng.rand(4, 128, 128, 3) * 2 - 1).astype(np.float32)
    b = (rng.rand(4, 128, 128, 3) * 2 - 1).astype(np.float32)

    jax_d = np.asarray(jax.jit(LPIPSAlex().apply)(
        {"params": params}, jnp.asarray(a), jnp.asarray(b)))

    # torch oracle: PNetLin('alex', lpips=True, spatial=False) semantics
    def np_(v):
        try:
            return v.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(v)

    convs = []
    for i, fi in enumerate([0, 3, 6, 8, 10]):
        for prefix in (f"features.{fi}", str(fi)):
            if f"{prefix}.weight" in alex_sd:
                w = torch.as_tensor(np_(alex_sd[f"{prefix}.weight"]))
                bias = torch.as_tensor(np_(alex_sd[f"{prefix}.bias"]))
                convs.append((w, bias))
                break
    lins = [torch.as_tensor(np_(lin_sd[f"lin{k}.model.1.weight"])).reshape(-1)
            for k in range(5)]
    shift = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
    scale = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]
    strides = [4, 1, 1, 1, 1]
    pads = [2, 2, 1, 1, 1]

    def feats(x):
        out = []
        for i, (w, bias) in enumerate(convs):
            x = F.relu(F.conv2d(x, w, bias, stride=strides[i], padding=pads[i]))
            out.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, 2)
        return out

    with torch.no_grad():
        ta = torch.from_numpy(a).permute(0, 3, 1, 2)
        tb = torch.from_numpy(b).permute(0, 3, 1, 2)
        f0, f1 = feats((ta - shift) / scale), feats((tb - shift) / scale)
        val = 0
        for k in range(5):
            def norm(t):
                return t / (t.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            diff = (norm(f0[k]) - norm(f1[k])) ** 2
            val = val + (diff * lins[k][None, :, None, None]).sum(
                1, keepdim=True).mean([2, 3], keepdim=True)
        torch_d = val[:, 0, 0, 0].numpy()

    return _compare("lpips", jax_d, torch_d, results)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--weights-dir", default=None,
                   help="override $MCVD_WEIGHTS_DIR / /tmp/weights discovery")
    p.add_argument("--report", default=None,
                   help="report path (default <weights-dir>/validation_report.json)")
    p.add_argument("--require-all", action="store_true",
                   help="fail if any backbone file is missing")
    args = p.parse_args(argv)

    if args.weights_dir:
        os.environ["MCVD_WEIGHTS_DIR"] = args.weights_dir

    import jax

    # oracle comparisons need full-precision matmuls (verify SKILL gotcha)
    jax.config.update("jax_default_matmul_precision", "highest")

    from mcvd_tpu.eval import weights as W

    if args.weights_dir:
        # explicit dir is exclusive — no fallback probing, so a validation
        # run certifies exactly the set it was pointed at
        def _find(fname):
            p = os.path.join(args.weights_dir, fname)
            return p if os.path.isfile(p) else None
    else:
        def _find(fname):
            return W.find_weights(None, fname)

    files = {
        "i3d": _find(W.I3D),
        "inception": _find(W.INCEPTION),
        "lpips_lin": _find(W.LPIPS_LIN),
        "alexnet": _find(W.ALEXNET),
    }
    results = {k: {"file": v} for k, v in files.items()}
    for k, v in files.items():
        if v:
            results[k]["sha256"] = sha256(v)
            results[k]["bytes"] = os.path.getsize(v)

    ok = True
    if files["i3d"]:
        ok &= validate_i3d(files["i3d"], results)
    else:
        results["i3d"]["status"] = "MISSING"
        ok &= not args.require_all
    if files["inception"]:
        ok &= validate_inception(files["inception"], results)
    else:
        results["inception"]["status"] = "MISSING"
        ok &= not args.require_all
    if files["lpips_lin"] and files["alexnet"]:
        ok &= validate_lpips(files["lpips_lin"], files["alexnet"], results)
        results["lpips_lin"]["status"] = results["alexnet"]["status"] = \
            results.get("lpips", {}).get("status", "?")
    else:
        results.setdefault("lpips", {})["status"] = "MISSING"
        ok &= not args.require_all

    report = {
        "overall": "PASS" if ok else "FAIL",
        "tolerances": {"rtol": RTOL, "atol": ATOL},
        "backbones": results,
    }
    wdir = args.weights_dir or os.environ.get("MCVD_WEIGHTS_DIR") or "/tmp/weights"
    report_path = args.report or os.path.join(wdir, "validation_report.json")
    if os.path.dirname(report_path):
        os.makedirs(os.path.dirname(report_path), exist_ok=True)
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"\n{'PASS' if ok else 'FAIL'} — report: {report_path}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
