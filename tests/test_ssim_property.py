"""SSIM fidelity on STRUCTURED images vs an independent direct-window oracle.

eval/metrics.ssim_grayscale implements skimage's protocol
(gaussian_weights=True, use_sample_covariance=False, data_range=255,
sigma=1.5/truncate=3.5, border crop) via separable gaussian_filter. This
test recomputes SSIM with an INDEPENDENT implementation — explicit 11x11
gaussian window applied by brute-force sliding windows — on structured
images (gradients, checkerboards, shifted blobs, contrast/brightness
edits), plus property checks (identity==1, symmetry, monotone degradation).
Tolerance 1e-10: the two implementations are algebraically identical, so
only float accumulation order differs.

Reference protocol: runners/ncsn_runner.py:1581-1609 (skimage
structural_similarity on 8-bit grayscale).
"""

import numpy as np
import pytest

from mcvd_tpu.eval.metrics import rgb_to_grayscale_uint8, ssim_grayscale

SIGMA, TRUNCATE = 1.5, 3.5


def _gauss_window():
    r = int(TRUNCATE * SIGMA + 0.5)  # 5 -> 11x11
    x = np.arange(-r, r + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / SIGMA) ** 2)
    g /= g.sum()
    return np.outer(g, g), r


def ssim_direct(img1, img2, data_range=255.0):
    """Brute-force windowed SSIM (independent oracle)."""
    w, r = _gauss_window()
    x = img1.astype(np.float64)
    y = img2.astype(np.float64)
    H, W = x.shape
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    vals = []
    for i in range(r, H - r):
        for j in range(r, W - r):
            px = x[i - r:i + r + 1, j - r:j + r + 1]
            py = y[i - r:i + r + 1, j - r:j + r + 1]
            ux, uy = (w * px).sum(), (w * py).sum()
            vx = (w * px * px).sum() - ux * ux
            vy = (w * py * py).sum() - uy * uy
            vxy = (w * px * py).sum() - ux * uy
            vals.append(((2 * ux * uy + C1) * (2 * vxy + C2))
                        / ((ux * ux + uy * uy + C1) * (vx + vy + C2)))
    return float(np.mean(vals))


def _structured_images():
    H = W = 24  # keeps the brute-force oracle fast; > 2*pad+1
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    ramp = (255 * xx / (W - 1))
    checker = 255.0 * ((yy // 4 + xx // 4) % 2)
    blob = 255.0 * np.exp(-((yy - 10) ** 2 + (xx - 10) ** 2) / 18.0)
    blob_shift = np.roll(blob, 2, axis=1)
    rng = np.random.RandomState(0)
    noisy_ramp = np.clip(ramp + 25 * rng.randn(H, W), 0, 255)
    dark_checker = 0.6 * checker + 20
    return [
        ("ramp vs noisy ramp", ramp, noisy_ramp),
        ("checker vs dark checker", checker, dark_checker),
        ("blob vs shifted blob", blob, blob_shift),
        ("ramp vs checker", ramp, checker),
    ]


@pytest.mark.parametrize("name,a,b", _structured_images(),
                         ids=[c[0] for c in _structured_images()])
def test_ssim_matches_direct_window_oracle(name, a, b):
    got = ssim_grayscale(a, b)
    ref = ssim_direct(a, b)
    assert abs(got - ref) < 1e-10, f"{name}: {got} vs {ref}"


def test_ssim_properties():
    _, a, b = _structured_images()[0]
    # identity
    assert ssim_grayscale(a, a) == pytest.approx(1.0, abs=1e-12)
    # symmetry
    assert ssim_grayscale(a, b) == pytest.approx(ssim_grayscale(b, a), abs=1e-12)
    # monotone degradation under increasing noise
    rng = np.random.RandomState(1)
    noise = rng.randn(*a.shape)
    vals = [ssim_grayscale(a, np.clip(a + s * noise, 0, 255))
            for s in (5, 20, 60)]
    assert vals[0] > vals[1] > vals[2]
    # bounded
    assert all(-1.0 <= v <= 1.0 for v in vals)


def test_mnist_bw_rounding_protocol():
    """MNIST-family path rounds to pure B/W before SSIM
    (ncsn_runner.py:1596-1599): grayscale conversion then 0/255 threshold."""
    rng = np.random.RandomState(2)
    f = rng.rand(24, 24, 1).astype(np.float32)
    g = rgb_to_grayscale_uint8(f)
    bw = np.where(g > 127, 255, 0).astype(np.float64)
    assert set(np.unique(bw)) <= {0.0, 255.0}
    s = ssim_grayscale(bw, bw)
    assert s == pytest.approx(1.0, abs=1e-12)
