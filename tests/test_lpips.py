"""LPIPS flax implementation vs a torch oracle of the reference PNetLin math
(networks_basic.py), with randomly initialized shared weights."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mcvd_tpu.eval.lpips import LPIPSAlex, convert_lpips_weights


class TorchAlexLPIPSOracle(torch.nn.Module):
    """PNetLin('alex', lpips=True, spatial=False, version='0.1') math."""

    def __init__(self):
        super().__init__()
        cfg = [(3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
               (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]
        self.convs = torch.nn.ModuleList(
            [torch.nn.Conv2d(i, o, k, s, p) for i, o, k, s, p in cfg]
        )
        self.lins = torch.nn.ParameterList(
            [torch.nn.Parameter(torch.rand(o)) for _, o, *_ in cfg]
        )
        self.register_buffer("shift", torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None])
        self.register_buffer("scale", torch.tensor([0.458, 0.448, 0.450])[None, :, None, None])

    def features(self, x):
        feats = []
        for i, conv in enumerate(self.convs):
            x = F.relu(conv(x))
            feats.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, 2)
        return feats

    def forward(self, in0, in1):
        f0 = self.features((in0 - self.shift) / self.scale)
        f1 = self.features((in1 - self.shift) / self.scale)
        val = 0
        for kk in range(5):
            def norm(t):
                n = torch.sqrt(torch.sum(t**2, dim=1, keepdim=True))
                return t / (n + 1e-10)
            diff = (norm(f0[kk]) - norm(f1[kk])) ** 2
            res = (diff * self.lins[kk][None, :, None, None]).sum(1, keepdim=True)
            val = val + res.mean([2, 3], keepdim=True)
        return val[:, 0, 0, 0]


def test_lpips_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = TorchAlexLPIPSOracle().eval()

    # pack oracle weights into the converter's expected dict formats
    alex_sd = {}
    for i, fi in enumerate([0, 3, 6, 8, 10]):
        alex_sd[f"features.{fi}.weight"] = oracle.convs[i].weight
        alex_sd[f"features.{fi}.bias"] = oracle.convs[i].bias
    lin_sd = {
        f"lin{kk}.model.1.weight": oracle.lins[kk].reshape(1, -1, 1, 1)
        for kk in range(5)
    }
    params = convert_lpips_weights(alex_sd, lin_sd)

    g = torch.Generator().manual_seed(1)
    a = torch.rand(2, 3, 64, 64, generator=g) * 2 - 1
    b = torch.rand(2, 3, 64, 64, generator=g) * 2 - 1
    with torch.no_grad():
        ref = oracle(a, b).numpy()

    model = LPIPSAlex()
    got = jax.jit(model.apply)(
        {"params": params},
        jnp.asarray(a.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(b.permute(0, 2, 3, 1).numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-5)
