"""Multi-host initialization (SURVEY §5.8: jax.distributed + XLA
collectives over ICI/DCN replace the reference's single-process
DataParallel).

Single-slice TPU pods need no explicit setup — ``jax.devices()`` sees every
chip on the host and the mesh in ``parallel/mesh.py`` covers them.  For
multi-host (pod slices / multi-slice DCN) the trainers call
``maybe_initialize(cfg.distributed, ...)`` at startup (--distributed flag):
with no explicit coordinator it uses jax.distributed's no-arg
auto-detection (the standard Cloud TPU pod path).  Initialization failures
PROPAGATE — a half-initialized pod silently training N divergent
single-process runs is far worse than failing fast; only the benign
"already initialized" case is swallowed.
"""
from __future__ import annotations

import logging
from typing import Optional, Tuple

__all__ = ["maybe_initialize"]


def maybe_initialize(enable: bool,
                     coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed when ``enable`` is set; no-op otherwise.

    Returns (process_index, process_count).
    """
    import jax

    if enable:
        # explicit args > HPVAEGAN_* env launcher contract > jax
        # auto-detection (Cloud TPU pods / SLURM / k8s).  The env form is
        # how a plain multi-machine launch (and the two-process CLI e2e
        # test) names the ring without a recognized cluster manager:
        #   HPVAEGAN_COORDINATOR=host0:1234 HPVAEGAN_NUM_PROCESSES=2 \
        #   HPVAEGAN_PROCESS_ID=<i> python train_video.py --distributed ...
        import os
        if coordinator_address is None \
                and os.environ.get("HPVAEGAN_COORDINATOR"):
            coordinator_address = os.environ["HPVAEGAN_COORDINATOR"]
            num_processes = int(os.environ["HPVAEGAN_NUM_PROCESSES"])
            process_id = int(os.environ["HPVAEGAN_PROCESS_ID"])
        kwargs = {}
        if coordinator_address is not None:
            kwargs = dict(coordinator_address=coordinator_address,
                          num_processes=num_processes,
                          process_id=process_id)
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError as exc:
            if "already" not in str(exc).lower():
                raise
        logging.info(f"jax.distributed: process "
                     f"{jax.process_index()}/{jax.process_count()}")
    return jax.process_index(), jax.process_count()
