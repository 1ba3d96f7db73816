#!/usr/bin/env python
"""Dump the optimized HLO of the bench forward scan and print the bodies of
named fusions (to map profiler hotspots back to model ops).

Usage: python tools/dump_hlo.py [fusion.1814 fusion.1809 ...]
"""

import re
import sys

from mcvd_tpu.utils import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

from mcvd_tpu import ops


def main():
    from __graft_entry__ import _flagship_config
    from mcvd_tpu.models import get_model

    B = 16
    on_tpu = jax.default_backend() != "cpu"
    ops.set_use_pallas(False)
    ops.set_use_pallas(on_tpu, kinds=("groupnorm",))

    config = _flagship_config()
    model = get_model(config)
    sz = config.data.image_size
    dtype = jnp.bfloat16
    x = jnp.zeros((B, sz, sz, 5), dtype)
    cond = jnp.zeros((B, sz, sz, 5), dtype)
    y = jnp.zeros((B,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, y, cond)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params)

    N = 50

    @jax.jit
    def run(x):
        def f(c, _):
            return model.apply(params, c, y, cond).astype(c.dtype), ()
        c, _ = jax.lax.scan(f, x, None, length=N)
        return c

    txt = run.lower(x).compile().as_text()
    with open("/tmp/bench_fwd.hlo", "w") as f:
        f.write(txt)
    print(f"# wrote /tmp/bench_fwd.hlo ({len(txt)/1e6:.1f} MB)")

    names = sys.argv[1:]
    if not names:
        return
    for name in names:
        # print the fusion instruction line and its called computation
        m = re.search(rf"%{re.escape(name)} = .*", txt)
        if not m:
            print(f"--- {name}: NOT FOUND")
            continue
        line = m.group(0)
        print(f"--- {name}:\n{line[:600]}")
        cm = re.search(r"calls=%?([\w.\-]+)", line)
        if cm:
            comp = cm.group(1)
            cdef = re.search(
                rf"%?{re.escape(comp)} [^{{]*{{(.*?)\n}}", txt, re.S)
            if cdef:
                body = cdef.group(1)
                print(body[:3000])


if __name__ == "__main__":
    main()
