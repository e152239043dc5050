from .metrics import diversity_score, psnr, reconstruction_psnr
from .svfid import frechet_distance, svfid

__all__ = ["diversity_score", "psnr", "reconstruction_psnr",
           "frechet_distance", "svfid"]
