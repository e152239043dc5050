"""Full-res rand-mode generation throughput, f32 vs bf16.

Default model geometry (9 refinement stages, 256px; 13 frames for the 3D
model), batch 2, 1 TPU chip.  Chain-timed (dependent steps ended by a
scalar fetch).  NDIM=2 measures the 2D image generator (images/sec).
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hpvaegan_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.models.registry import make_generator

BF16 = len(sys.argv) > 1 and sys.argv[1] == "bf16"
NDIM = int(__import__("os").environ.get("NDIM", "3"))

cfg = Config(nfc=64, latent_dim=128, num_layer=5, enc_blocks=2,
             vae_levels=3, batch_size=2, img_size=256, min_size=32,
             max_size=256)
cfg.bf16 = BF16
# PCONV=1: route qualifying generator-stage body convs to the packed
# Pallas kernel (pconv_all -> Stage pconv field).  Training measured this
# routing slower (dw/VJP residual costs, BENCHMARKS.md) — sampling has no
# backward pass, so the forward-only kernel gets its own A/B here.
if __import__("os").environ.get("PCONV", "") == "1":
    cfg.pconv_all = True
cfg.adjust_scales()
cfg.ar = 1.0
from _geometry import make_pyramid, noise_init_shape  # noqa: E402
pyr = make_pyramid(cfg, NDIM)
SCALE = cfg.stop_scale  # 9
cfg.scale_idx = SCALE

key = jax.random.PRNGKey(0)
G = make_generator("GeneratorHPVAEGAN", cfg, pyr, NDIM)
gvars = G.init(key, 1)
for i in range(SCALE):
    gvars = G.init_next_stage(gvars, jax.random.fold_in(key, 100 + i))
amps = jnp.full(SCALE + 1, 0.1, jnp.float32)

batch = int(__import__('os').environ.get('BS', '2'))
noise_shape = noise_init_shape(pyr, batch, cfg.latent_dim, NDIM)


@jax.jit
def sample(gv, noise, k):
    (fake, _, _), _ = G.apply(gv, amps, k, noise_init=noise, mode="rand",
                              train=True)
    return fake


def chain(n, seed):
    out = None
    k = jax.random.fold_in(key, seed)
    noise = jax.random.normal(k, noise_shape)
    for i in range(n):
        out = sample(gvars, noise, jax.random.fold_in(k, i))
        # feed a slice of the output back into the noise to chain deps
        noise = noise + 0 * jnp.mean(out)
    return float(jnp.mean(out))


mode = "bf16" if BF16 else "f32"
t0 = time.perf_counter()
chain(2, 1)
print(f"[{mode}] warmup (incl. compile): {time.perf_counter()-t0:.1f}s",
      flush=True)
# 2D batches are ~10 ms: use a longer chain so the ~40 ms relay scalar
# fetch amortizes instead of inflating ms/batch
N = 20 if NDIM == 3 else 200
t0 = time.perf_counter()
chain(N, 2)
dt = time.perf_counter() - t0
frames = N * batch * (pyr.td(SCALE) if NDIM == 3 else 1)
unit = "frames" if NDIM == 3 else "images"
print(f"[{mode}] {N} batches ({frames} {unit} of "
      f"{pyr.shape2d(SCALE)}) in {dt:.2f}s -> "
      f"{1000*dt/N:.1f} ms/batch, {frames/dt:.0f} {unit}/s", flush=True)
