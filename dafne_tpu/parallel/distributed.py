"""Multi-process (multi-host) execution support — SURVEY.md §5.8.

The reference launches one process per GPU across machines and coordinates
with torch.distributed (tools/plain_train_net.py:660-671, `--num-machines`/
`--machine-rank`/`--dist-url`).  The TPU-native equivalent is one process
per HOST, each addressing its local chips, with a single global SPMD
program over the full-pod mesh:

  - `jax.distributed.initialize` forms the cluster (auto-detected on TPU
    pods; explicit coordinator/rank for CPU test clusters),
  - each process feeds its slice of the global batch
    (`jax.make_array_from_process_local_data`, see parallel.mesh.shard_batch),
  - XLA collectives ride ICI; nothing else changes in the step function,
  - host-side side effects (metric writers, eval artifacts, RTPT) are gated
    to process 0; orbax checkpointing participates on every process.

Environment contract (tools/train.py calls maybe_initialize_distributed):
  DAFNE_DISTRIBUTED=auto      -> jax.distributed.initialize() auto-detect
                                 (TPU pod metadata / cloud environment)
  DAFNE_COORDINATOR=host:port + DAFNE_NUM_PROCESSES + DAFNE_PROCESS_ID
                              -> explicit cluster (CPU test harness)
  DAFNE_CPU_COLLECTIVES=gloo  -> cross-process CPU collectives (tests)
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger("dafne_tpu")


def maybe_initialize_distributed(env=None) -> bool:
    """Form the multi-process cluster if the environment asks for one.

    Must run before the backend initializes (first jax.devices()).
    Returns True if distributed mode was initialized.
    """
    env = os.environ if env is None else env
    cpu_coll = env.get("DAFNE_CPU_COLLECTIVES", "")
    if cpu_coll:
        jax.config.update("jax_cpu_collectives_implementation", cpu_coll)

    if env.get("DAFNE_DISTRIBUTED", "") == "auto":
        jax.distributed.initialize()
    elif env.get("DAFNE_COORDINATOR", ""):
        jax.distributed.initialize(
            coordinator_address=env["DAFNE_COORDINATOR"],
            num_processes=int(env["DAFNE_NUM_PROCESSES"]),
            process_id=int(env["DAFNE_PROCESS_ID"]),
        )
    else:
        return False
    logger.info(
        f"distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{len(jax.local_devices())} local of {len(jax.devices())} devices"
    )
    # Eagerly create the collectives context while processes are still in
    # lockstep.  XLA's gloo KV exchange has a HARDCODED 30 s deadline and the
    # context is created lazily at the FIRST collective — which otherwise
    # fires deep inside startup (orbax root-dir sync), after minutes of
    # per-process model building whose skew on an oversubscribed host easily
    # exceeds 30 s (observed: DEADLINE_EXCEEDED cpu:gloo GetKeyValue).  A
    # trivial psum here pins context creation to this moment, when the
    # processes are within milliseconds of each other; later collectives
    # reuse the context and carry no deadline race.
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("dafne:startup-barrier")
        logger.info("distributed: startup collectives barrier passed")
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_batch_slice(global_batch: int):
    """This process's contiguous row range of a global batch.

    Row p*B/P .. (p+1)*B/P mirrors the device order of create_mesh (data
    axis is process-major, so each process's rows land on its own chips
    without cross-host transfers at device_put time).
    """
    pc = process_count()
    assert global_batch % pc == 0, (global_batch, pc)
    per = global_batch // pc
    p = process_index()
    return p * per, (p + 1) * per
