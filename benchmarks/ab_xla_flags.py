"""TPU compiler-option sweep on the decode stage — the last untried
*toolchain* lever.

Every model-level lever on the decoder is a measured closed negative
(docs/ROADMAP.md dead-ends: all-Pallas 0.68x, gn-stats fusion 5.4 ms
ceiling, int8 both paths).  What was never tried is steering XLA itself:
``xla_tpu_scoped_vmem_limit_kib`` bounds how much VMEM the fusion cost
model may assume, which directly gates conv fusion depth on TPU — the
decoder's blocked-conv graph at 25-55 TF/s is exactly the kind of
fusion-decision-bound graph it can move.

Channel note: ``XLA_FLAGS`` does NOT work here — compilation is remote
(axon tunnel) and the local CPU-only XLA rejects TPU flags at process
start (``Unknown flag in XLA_FLAGS``, measured 2026-08-19).  The working
channel is per-compile PJRT ``compiler_options`` via
``jit(f).lower(...).compile(compiler_options=...)``, which the plugin
forwards to the remote TPU compiler.  Single process, one AOT compile per
config; unknown options raise per-config and are recorded, not fatal.

Run: nohup python -u benchmarks/ab_xla_flags.py > /tmp/ab_xla_flags.log 2>&1 &
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = {
    "default": {},
    "svmem32": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "svmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "svmem128": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "flops_sched": {"xla_tpu_enable_dot_strength_reduction": "false"},
}


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
    import numpy as np
    import jax
    import jax.numpy as jnp

    from sdmatte_tpu.configs import SDMatteConfig
    from sdmatte_tpu.core.dtypes import BF16
    from sdmatte_tpu.models import vae

    cfg = SDMatteConfig()
    pol = BF16
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, pol.param_dtype), vae.init(cfg.vae, seed=0))
    rng = np.random.default_rng(0)

    def decode(p, z):
        return vae.decode(p, z, cfg.vae, policy=pol, attn_impl="flash")

    results = {}
    for name, opts in CONFIGS.items():
        results[name] = {}
        for b, iters in ((1, 8), (8, 3)):
            lat = jnp.asarray(rng.uniform(-1, 1, (b, 128, 128, 4)),
                              jnp.bfloat16)
            try:
                lowered = jax.jit(decode).lower(params, lat)
                compiled = lowered.compile(
                    compiler_options=opts if opts else None)
            except Exception as e:
                print(f"{name} b={b}: COMPILE FAILED: "
                      f"{str(e)[:300]}", flush=True)
                results[name][f"decode_b{b}_ms"] = None
                continue
            times = []
            for i in range(2 + iters):
                t0 = time.perf_counter()
                r = compiled(params, lat)
                float(jnp.sum(r[..., :1, :1, :1]))
                if i >= 2:
                    times.append(time.perf_counter() - t0)
            ms = round(float(np.median(times)) * 1e3, 1)
            results[name][f"decode_b{b}_ms"] = ms
            print(f"{name} b={b}: {ms} ms", flush=True)

    base = results.get("default")
    print("\n=== summary (vs default) ===", flush=True)
    for name, r in results.items():
        rel = {k: (round(base[k] / r[k], 3) if r.get(k) and base.get(k)
                   else None) for k in r}
        print(f"{name:12s} {json.dumps(r)}  speedup={json.dumps(rel)}",
              flush=True)


if __name__ == "__main__":
    main()
