"""Multi-host bring-up: jax.distributed + a global mesh.

The reference has no distributed layer (single process, OpenCilk threads —
SURVEY.md §5); this is the TPU-native scale-out path for BASELINE config 4
(10k-genome all-pairs on a pod slice):

  * every host calls `init_distributed()` (env-driven coordinator discovery
    or explicit args), then `global_mesh()` builds the 2-D ("r", "c") mesh
    over ALL devices in the job;
  * the sharded entry points in parallel/ are mesh-agnostic — the same
    shard_map programs run on a single-host mesh (tests force 8 virtual CPU
    devices) or a multi-host slice, with XLA routing the all-pairs
    resharding over ICI within a slice and DCN across hosts;
  * sketches checkpoint per host via store.SketchStore, so an elastic
    restart resumes from saved sketches (the reference loses everything).

Only one physical chip is reachable in this build environment, so
multi-host execution is validated via the virtual-device mesh tests and
`__graft_entry__.dryrun_multichip`; this module is the production wiring.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from .mesh import make_mesh


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the jax.distributed runtime (idempotent).

    With no arguments, jax reads the cluster environment (TPU pod metadata
    or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    if getattr(init_distributed, "_done", False):
        return
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    # initialize() must run BEFORE any backend-querying API (process_count,
    # devices, ...): touching a backend first initializes JAX single-process
    # and initialize() then always fails, silently degrading a pod run.
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        if "already" in str(e).lower():
            pass  # idempotent re-init: fine in any mode
        elif kwargs:
            raise  # a coordinator was named (args or env): surface failures
        # else: auto-detection probe on a machine with no cluster metadata
        # (RuntimeError, or ValueError 'coordinator_address should be
        # defined') — the normal single-process case
    init_distributed._done = True


def global_mesh(shape: Optional[Tuple[int, int]] = None):
    """2-D ("r", "c") mesh over every device in the (possibly multi-host)
    job.  Prefer shapes whose "c" axis stays within one host so all-pairs
    column gathers ride ICI and only row-block exchanges cross DCN."""
    return make_mesh(shape=shape, devices=jax.devices())


def process_shard(n_items: int) -> slice:
    """This host's contiguous shard of n_items (coarse host-level work
    splitting).  For ingest feeding a SHARDED device batch use
    local_batch_rows instead — the rows a host must parse are the rows its
    own devices hold under the actual sharding, which a contiguous
    ceil-division split does not reproduce (e.g. 5 genomes, 2 hosts x 4
    devices: the padded batch puts rows 0-3 on host 0, but the ceil split
    hands row 3 to host 1 — the row would be ingested by nobody that
    places it)."""
    p, np_ = jax.process_index(), jax.process_count()
    per = (n_items + np_ - 1) // np_
    return slice(p * per, min(n_items, (p + 1) * per))


def local_batch_rows(mesh, spec, n_items: int, pad_multiple: int):
    """Indices in [0, n_items) of the leading-axis rows that THIS process's
    devices hold when an (n_items padded to pad_multiple)-row batch is
    sharded with `spec` over `mesh` — per-host FASTA ingest parses exactly
    these (SURVEY.md §2.1 genome-level data parallelism)."""
    from jax.sharding import NamedSharding

    n_pad = ((n_items + pad_multiple - 1) // pad_multiple) * pad_multiple
    sharding = NamedSharding(mesh, spec)
    me = jax.process_index()
    local = set()
    for dev, idx in sharding.devices_indices_map((n_pad,)).items():
        if dev.process_index != me:
            continue
        local.update(range(*idx[0].indices(n_pad)))
    return {i for i in local if i < n_items}
