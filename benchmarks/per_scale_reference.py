"""Per-scale train-step throughput of the UNMODIFIED reference (torch CPU).

Mirrors bench.py's reference driver at an arbitrary scale; VAE phase below
vae_levels=3, full WGAN-GP GAN phase above.  Usage:
[NDIM=2] python benchmarks/per_scale_reference.py 0 2 4
NDIM=2 measures networks_2d / train_image.py's workload (4-D tensors, no
temporal axis); default is the 3-D video workload.
"""
import argparse, json, os, sys, time, types

import torch
import torch.optim as optim

torch.set_num_threads(os.cpu_count() or 1)
for name in ("torchvision", "torchvision.utils", "torchvision.transforms"):
    if name not in sys.modules:
        m = types.ModuleType(name)
        if name.endswith("utils"):
            m.make_grid = lambda *a, **k: None
        sys.modules[name] = m
sys.path.insert(0, "/root/reference")
NDIM = int(os.environ.get("NDIM", "3"))
if NDIM == 3:
    from modules import networks_3d as networks
else:
    from modules import networks_2d as networks
from modules.losses import kl_criterion
from modules.utils import calc_gradient_penalty
import utils as ref_utils

SCALES = [int(s) for s in sys.argv[1:]] or [0, 2, 4, 7, 9]
results = {}

for SCALE in SCALES:
    opt = argparse.Namespace(
        nfc=64, latent_dim=128, num_layer=5, enc_blocks=2, ker_size=3,
        padd_size=1, nc_im=3, vae_levels=3, train_all=False, img_size=256,
        min_size=32, max_size=256, scale_factor=0.75, scale_factor_init=0.75,
        sampling_rates=[4, 3, 2, 1], stop_scale_time=-1, org_fps=30.0,
        fps_lcm=12, ar=1.0, device="cpu", lr_g=5e-4, lr_d=5e-4, beta1=0.5,
        lambda_grad=0.1, rec_weight=10.0, kl_weight=1.0,
        disc_loss_weight=1.0, grad_clip=5.0, batch_size=2)
    ref_utils.adjust_scales2image(opt.img_size, opt)
    if opt.stop_scale_time == -1:
        opt.stop_scale_time = opt.stop_scale

    netG = networks.GeneratorHPVAEGAN(opt)
    for _ in range(SCALE):
        netG.init_next_stage()
    optimizerG = optim.Adam(netG.parameters(), lr=opt.lr_g,
                            betas=(opt.beta1, 0.999))
    gan = opt.vae_levels < SCALE + 1
    if gan:
        netD = getattr(networks, f"WDiscriminator{NDIM}D")(opt)
        optimizerD = optim.Adam(netD.parameters(), lr=opt.lr_d,
                                betas=(opt.beta1, 0.999))

    _, td0, _ = ref_utils.get_fps_td_by_index(0, opt)
    _, td_s, _ = ref_utils.get_fps_td_by_index(SCALE, opt)
    size0 = ref_utils.get_scales_by_index(0, opt.scale_factor,
                                          opt.stop_scale, opt.img_size)
    size_s = ref_utils.get_scales_by_index(SCALE, opt.scale_factor,
                                           opt.stop_scale, opt.img_size)
    b = 2
    if NDIM == 3:
        real = torch.randn(b, 3, td_s, size_s, size_s)
        real_zero = torch.randn(b, 3, td0, size0, size0)
        noise_init = torch.randn(b, opt.latent_dim, td0, size0, size0)
    else:
        real = torch.randn(b, 3, size_s, size_s)
        real_zero = torch.randn(b, 3, size0, size0)
        noise_init = torch.randn(b, opt.latent_dim, size0, size0)
    noise_amps = [0.1] * (SCALE + 1)

    def one_iter():
        generated, generated_vae, (mu, logvar) = netG(real_zero, noise_amps,
                                                      mode="rec")
        if gan:
            netD.zero_grad()
            errD_real = -netD(real).mean()
            fake, _ = netG(noise_init, noise_amps, noise_init=noise_init,
                           mode="rand")
            errD_fake = netD(fake.detach()).mean()
            gp = calc_gradient_penalty(netD, real, fake, opt.lambda_grad,
                                       "cpu")
            (errD_real + errD_fake + gp).backward()
            optimizerD.step()
            rec = torch.nn.functional.mse_loss(generated, real)
            errG = -netD(fake).mean() * opt.disc_loss_weight
            total = opt.rec_weight * rec + errG
        else:
            rec = (torch.nn.functional.mse_loss(generated, real)
                   + torch.nn.functional.mse_loss(generated_vae, real_zero))
            total = opt.rec_weight * rec + opt.kl_weight * kl_criterion(
                mu, logvar)
        netG.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(netG.parameters(), opt.grad_clip)
        optimizerG.step()

    if NDIM == 3:
        warm = 1 if SCALE < 7 else 0
        iters = 3 if SCALE < 7 else (2 if SCALE < 9 else 1)
    else:  # 2D is ~an order of magnitude cheaper per step
        warm = 1
        iters = 10 if SCALE < 7 else 3
    for _ in range(warm):
        one_iter()
    t0 = time.perf_counter()
    for _ in range(iters):
        one_iter()
    dt = time.perf_counter() - t0
    rate = iters / dt
    phase = "gan" if gan else "vae"
    td_tag = f"td={td_s}, " if NDIM == 3 else ""
    print(f"scale {SCALE} ({phase}, {td_tag}{size_s}px): "
          f"{iters} iters in {dt:.1f}s -> {rate:.4f} it/s", flush=True)
    results[SCALE] = {"phase": phase, "it_per_s": round(rate, 5)}

print(json.dumps(results), flush=True)
