"""Multi-device tests on the 8-virtual-CPU mesh (SURVEY.md §4: the JAX
equivalent of a fake distributed backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hpvaegan_tpu.core.config import Config
from hpvaegan_tpu.core.pyramid import Pyramid
from hpvaegan_tpu.models.registry import make_generator
from hpvaegan_tpu.parallel import (batch_spec, default_mesh_shape, make_mesh,
                                   shard_batch, shard_gvars)


@pytest.fixture(scope="module")
def setup():
    cfg = Config(nfc=8, latent_dim=8, num_layer=2, enc_blocks=1, min_size=8,
                 max_size=16, img_size=16, vae_levels=1, batch_size=4)
    cfg.adjust_scales()
    cfg.ar = 1.0
    pyr = Pyramid.for_video(16, 1.0, 8, 16, 0.75, [4, 3, 2, 1], 24.0)
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr, 3)
    key = jax.random.PRNGKey(0)
    gvars = G.init(key, 1)
    gvars = G.init_next_stage(gvars, jax.random.fold_in(key, 1))
    gvars = G.init_next_stage(gvars)
    return cfg, pyr, G, gvars


def test_mesh_shapes():
    assert default_mesh_shape(8) == (2, 4)
    assert default_mesh_shape(2) == (2,)
    assert default_mesh_shape(1) == (1,)
    mesh = make_mesh((2, 4))
    assert mesh.axis_names == ("data", "spatial")


def test_sharded_forward_matches_replicated(setup, key):
    """Data+spatial-sharded forward must be numerically identical to the
    single-device run (sharding is an implementation detail)."""
    cfg, pyr, G, gvars = setup
    amps = jnp.ones(3)
    x = jax.random.normal(key, (4, *pyr.shape3d(0), 3))

    def fwd(gv, xx):
        (out, _, _), _ = G.apply(gv, amps, jax.random.PRNGKey(5),
                                 real_zero=xx, mode="rec", train=True)
        return out

    ref = jax.jit(fwd)(gvars, x)

    mesh = make_mesh((2, 4))
    x_sh = shard_batch(x, mesh, 3)
    gv_sh = shard_gvars(gvars, mesh)
    out = jax.jit(fwd)(gv_sh, x_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[0] == 2


def test_spmd_training_cli_e2e(tmp_path):
    """Full train_video.py run with --spmd --mesh-shape 2x4 on the virtual
    mesh: both phases + stage growth + checkpointing execute SPMD (the
    CLI-level complement of the forward-equivalence test above)."""
    import importlib
    import json
    import os
    import sys

    asset = os.path.join(os.path.dirname(__file__), "assets",
                         "test_video.avi")
    mod = importlib.import_module("train_video")
    argv = ["train_video.py", "--video-path", asset, "--img-size", "16",
            "--min-size", "8", "--max-size", "16", "--niter", "2",
            "--nfc", "8", "--num-layer", "2", "--batch-size", "2",
            "--vae-levels", "2", "--latent-dim", "8", "--enc-blocks", "1",
            "--manualSeed", "11", "--spmd", "--mesh-shape", "2x4",
            "--run-dir", str(tmp_path)]
    old = sys.argv
    sys.argv = argv
    try:
        mod.main()
    finally:
        sys.argv = old

    exp = os.path.join(tmp_path, "test_video", "DEBUG", "experiment_0")
    with open(os.path.join(exp, "Noise_Amps.json")) as f:
        amps = json.load(f)["noise_amps"]
    assert len(amps) == 5 and all(np.isfinite(a) for a in amps)
    assert os.path.exists(os.path.join(exp, "netG"))
    assert os.path.exists(os.path.join(exp, "netD_4"))
