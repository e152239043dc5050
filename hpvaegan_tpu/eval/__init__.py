from .metrics import diversity_score, psnr, reconstruction_psnr
# implementation lives in _svfid.py: the public function is named `svfid`,
# and a same-named submodule would be shadowed by this re-export
from ._svfid import frechet_distance, svfid

__all__ = ["diversity_score", "psnr", "reconstruction_psnr",
           "frechet_distance", "svfid"]
