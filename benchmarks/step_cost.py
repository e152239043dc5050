"""Exact XLA cost analysis + optional profiler trace of the scale-9 step.

Computes compiled FLOPs / bytes-accessed of the real fused gan_step (the
same program component_breakdown.py times at 1.64 s), giving the exact
MFU and the latency floor the VERDICT-r2 item 3 asks to either beat or
prove.  With TRACE=1 also captures a jax.profiler trace of N steps into
/tmp/prof_scale{S} for op-level attribution.

Usage: [SCALE=9] [FAST=1] [BF16=1] [REMAT=1] [GPCHUNK=1] [TRACE=1]
       [CPU=1 SMALL=1] python benchmarks/step_cost.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# reuse the full harness (cfg, G/D/optimizers, steps, inputs) — identical
# program construction to the timing run
from component_breakdown import (cfg, steps, gvars, dvars, opt_g, opt_d,
                                 real, real_zero, noise_init, amps, SCALE)
import jax
import jax.numpy as jnp


def main():
    import jax.tree_util as jtu
    args = (jtu.tree_map(jnp.copy, gvars), jtu.tree_map(jnp.copy, dvars),
            jtu.tree_map(jnp.copy, opt_g), jtu.tree_map(jnp.copy, opt_d),
            real, real_zero, noise_init, amps, jax.random.PRNGKey(9))
    lowered = steps["gan_step"].lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))
    print(f"scale {SCALE} gan_step: flops={flops:.4g} "
          f"bytes_accessed={bytes_acc:.4g}", flush=True)
    try:
        mem = compiled.memory_analysis()
        print(f"  temp={getattr(mem, 'temp_size_in_bytes', '?')}"
              f" argument={getattr(mem, 'argument_size_in_bytes', '?')}"
              f" output={getattr(mem, 'output_size_in_bytes', '?')}",
              flush=True)
    except Exception as e:
        print(f"  memory_analysis unavailable: {e}", flush=True)
    # floor math at v5e peaks
    peak_bf16 = 197e12
    peak_hbm = 819e9
    if flops == flops:
        print(f"  compute floor @197TF/s bf16: {flops / peak_bf16 * 1e3:.1f}"
              f" ms;  HBM floor @819GB/s: {bytes_acc / peak_hbm * 1e3:.1f} ms",
              flush=True)

    if os.environ.get("TRACE", "0") == "1":
        import time
        out_dir = f"/tmp/prof_scale{SCALE}"
        # settle/compile outside the trace
        o = steps["gan_step"](*args)
        float(o[-1]["loss"])
        args2 = (o[0], o[1], o[2], o[3], real, real_zero, noise_init, amps,
                 jax.random.PRNGKey(10))
        with jax.profiler.trace(out_dir):
            t0 = time.perf_counter()
            o = steps["gan_step"](*args2)
            v = float(o[-1]["loss"])
            dt = time.perf_counter() - t0
        print(f"  traced 1 step: {dt * 1e3:.1f} ms (v={v:.3f}) -> {out_dir}",
              flush=True)


if __name__ == "__main__":
    main()
