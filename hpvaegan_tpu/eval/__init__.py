from .metrics import diversity_score, psnr, reconstruction_psnr

__all__ = ["diversity_score", "psnr", "reconstruction_psnr"]
