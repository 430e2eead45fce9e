"""Multi-host (multi-process) scaling over DCN + ICI.

The reference is a single-process program; its only scaling axis is one CPU
core (SURVEY §2.3). Here the block axis scales across hosts with ZERO
cross-host traffic (blocks are independent — the block-boundary carrier
phase is chained on the host side in parallel/blocks.py), and the channel
axis stays inside a host so its psum rides ICI:

    mesh = (blocks = all_hosts x local_blocks, chan = intra-host)

Workflow per process:
  1. ``initialize()`` — jax.distributed rendezvous (TPU pods auto-detect;
     CPU/GPU need coordinator/num_processes/process_id).
  2. Every process runs the same deterministic Simulation and plans the
     same timeline (host planning is cheap, ~1 ms/block, and this keeps
     the design stateless — no plan broadcast needed).
  3. ``scatter_batch`` builds global device arrays from each process's
     local shard of the block batch.
  4. The shard_map'd synthesizer (parallel/shard.py) runs one jit across
     the global mesh; each process gets back its addressable output shard
     and streams it to its own sink.

Tested without a cluster in tests/test_multihost.py: two OS processes,
each with 4 virtual CPU devices, rendezvous over localhost and must each
reproduce the single-process NumPy reference bit-exactly.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.synth_jax import ARG_ORDER
from .shard import _CHAN_AXIS, make_sharded_synth


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """jax.distributed rendezvous (no-op if already initialized)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # already initialized
        if "already initialized" not in str(e):
            raise


def global_mesh(chan_shards: int = 1) -> Mesh:
    """(blocks, chan) mesh over ALL processes' devices.

    Devices are taken in jax.devices() order (grouped by process), so the
    chan axis — the only axis with a collective — stays within a process
    as long as chan_shards divides the local device count.
    """
    devices = np.asarray(jax.devices())
    n_local = len(jax.local_devices())
    if n_local % chan_shards != 0:
        raise ValueError(
            f"chan_shards={chan_shards} must divide local devices {n_local} "
            "so the psum stays on ICI"
        )
    return Mesh(
        devices.reshape(devices.size // chan_shards, chan_shards),
        ("blocks", "chan"),
    )


def global_mesh_chan_major() -> Mesh:
    """(blocks, chan) mesh whose CHAN axis spans processes — one mesh
    column per process — so the channel psum crosses the process
    boundary (DCN) instead of staying process-local.

    Production meshes keep the psum intra-process (``global_mesh``: the
    cheap collective rides ICI); this layout exists to certify that the
    collective is bit-exact even across processes (the psum is integer,
    so placement cannot change the sum) — exercised by the driver
    dryrun's ``+multiproc-dcn4`` pass with 4 OS processes x 2 devices.
    """
    devices = np.asarray(jax.devices())
    n_local = len(jax.local_devices())
    n_proc = devices.size // n_local
    # jax.devices() groups by process: reshape (proc, local) and
    # transpose, so rows (blocks axis) are local-device indices and
    # columns (chan axis) are processes.
    return Mesh(devices.reshape(n_proc, n_local).T, ("blocks", "chan"))


def synthesize_chan_major(
    batch: dict, mesh: Mesh, n_rows: int, num_samples: int,
    wide: bool = False, out_bits: int = 16, fn=None,
    kernel: str | None = None,
) -> np.ndarray:
    """Synthesize one batch over a chan-major mesh (process-spanning
    psum, see ``global_mesh_chan_major``).

    Every process holds the full deterministic batch (same planning
    everywhere); inputs are assembled per-device via callback, and the
    post-psum output — replicated along chan, so each process's device
    column carries every block row — is gathered whole.  Returns the
    complete quantized batch on every process."""
    if fn is None:
        fn = make_sharded_synth(
            mesh, n_rows, num_samples, wide=wide, out_bits=out_bits,
            kernel=kernel,
        )
    args = {}
    for k in ARG_ORDER:
        v = batch[k]
        spec = [None] * v.ndim
        spec[0] = "blocks"
        if mesh.shape["chan"] > 1:
            spec[_CHAN_AXIS[k]] = "chan"
        sharding = NamedSharding(mesh, P(*spec))
        args[k] = jax.make_array_from_callback(
            v.shape, sharding, lambda idx, v=v: v[idx]
        )
    out = fn(args)
    rows = {}
    for s in out.addressable_shards:
        rows[s.index[0].start or 0] = np.asarray(s.data)
    return np.concatenate([rows[k] for k in sorted(rows)], axis=0)


def process_block_slice(n_blocks: int, mesh: Mesh) -> slice:
    """The contiguous block range this process owns on the blocks axis.

    n_blocks must be padded to a multiple of the mesh blocks dimension
    (see shard.pad_batch)."""
    blocks_dim = mesh.shape["blocks"]
    if n_blocks % blocks_dim != 0:
        raise ValueError(
            f"n_blocks={n_blocks} must be padded to a multiple of the mesh "
            f"blocks dimension {blocks_dim} (shard.pad_batch)"
        )
    per_shard = n_blocks // blocks_dim
    # Rows of the mesh owned by this process, in device order.
    pid = jax.process_index()
    rows = [
        i
        for i in range(blocks_dim)
        if mesh.devices[i, 0].process_index == pid
    ]
    if rows != list(range(rows[0], rows[0] + len(rows))):
        raise ValueError("process's mesh rows must be contiguous")
    return slice(rows[0] * per_shard, (rows[-1] + 1) * per_shard)


def scatter_batch(batch: dict, mesh: Mesh) -> dict:
    """Per-process local shards → global device arrays for the mesh.

    Every process passes the SAME full batch (deterministic planning);
    each hands JAX its own block slice — the process-local data — and the
    pieces assemble into one global array per arg."""
    n_blocks = batch["gain_a"].shape[0]
    sl = process_block_slice(n_blocks, mesh)
    out = {}
    for k in ARG_ORDER:
        v = batch[k]
        spec = [None] * v.ndim
        spec[0] = "blocks"
        if mesh.shape["chan"] > 1:
            spec[_CHAN_AXIS[k]] = "chan"
        sharding = NamedSharding(mesh, P(*spec))
        out[k] = jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(v[sl]), global_shape=v.shape
        )
    return out


def synthesize_multihost(
    batch: dict, mesh: Mesh, n_rows: int, num_samples: int,
    wide: bool = False, out_bits: int = 16, fn=None,
    kernel: str | None = None,
) -> tuple[np.ndarray, slice]:
    """Run the sharded synthesizer across the global mesh.

    Returns (local_blocks, block_slice): the IQ blocks this process owns
    (int16, or device-quantized int8 with out_bits=8) and where they sit
    in the global batch. Pass a prebuilt ``fn`` from make_sharded_synth
    when calling in a loop — building it per call discards the jit cache
    and recompiles every window. ``kernel`` selects the per-device
    compute (shard.make_sharded_synth; default = production Pallas on
    TPU, XLA elsewhere)."""
    if fn is None:
        fn = make_sharded_synth(
            mesh, n_rows, num_samples, wide=wide, out_bits=out_bits,
            kernel=kernel,
        )
    global_out = fn(scatter_batch(batch, mesh))

    n_blocks = batch["gain_a"].shape[0]
    sl = process_block_slice(n_blocks, mesh)
    # The output is replicated over 'chan'; keep one shard per block range.
    uniq = {
        (s.index[0].start or 0): s for s in global_out.addressable_shards
    }
    local = np.concatenate(
        [np.asarray(uniq[k].data) for k in sorted(uniq)], axis=0
    )
    if local.shape[0] != sl.stop - sl.start:
        raise RuntimeError(
            f"assembled {local.shape[0]} local blocks, process slice "
            f"expects {sl.stop - sl.start}"
        )
    return local, sl


def run_scenario_multihost(
    cfg, chan_shards: int = 1, window_blocks: int = 64,
    kernel: str | None = None,
) -> str:
    """Full scenario across all processes → per-process part file + index.

    Every process plans the same deterministic scenario, synthesizes its
    share of each window over the global mesh, and streams its (quantized)
    blocks to ``{out_file}.part{pid}`` with a JSON index of global block
    ranges. ``merge_parts`` assembles the reference-compatible stream.
    jax.distributed must be initialized first (see ``initialize``)."""
    import itertools
    import json

    from ..config import CarrierMode
    from ..ops.synth_jax import LANES, needs_wide_window
    from ..scenario import Simulation
    from .shard import pad_batch, pad_channels

    from .blocks import collate_plans

    mesh = global_mesh(chan_shards)
    sim = Simulation(cfg)
    n_rows = -(-cfg.samples_per_epoch // LANES)
    bits = cfg.sample_format.value
    int_nco = cfg.carrier_mode is CarrierMode.INT_NCO
    from ..runner import strict_parity_enabled

    strict = strict_parity_enabled(cfg)
    if cfg.parity_exact and not strict:
        # Availability of the native sequential engine may differ between
        # hosts; a process quietly falling back to closed-form output
        # would corrupt the merged stream (parts disagree at the sparse
        # correction samples). Fail loudly instead — deterministically on
        # every process that lacks the engine.
        raise RuntimeError(
            "parity_exact multihost run requires the native sequential "
            "engine on every process (tools/build_native.sh), or set "
            "parity_exact=False"
        )
    if strict:
        from ..ops.synth_seq import apply_corrections, seq_corrections
    if cfg.noise_std_lsb > 0.0:
        from ..noise import apply_awgn
    wide = needs_wide_window(1.0 / cfg.sample_rate)
    # One compiled synthesizer for the whole run (all windows share the
    # same shapes; rebuilding it per window would recompile every time).
    # The SimConfig backend picks the mesh kernel unless overridden: the
    # PALLAS backend rides the mesh at the production-kernel rate.
    if kernel is None:
        from ..config import SynthBackend

        if cfg.backend is SynthBackend.PALLAS and (
            jax.default_backend() == "tpu"
        ):
            kernel = "pallas-fused"
    fn = make_sharded_synth(
        mesh, n_rows, cfg.samples_per_epoch, wide=wide, out_bits=bits,
        kernel=kernel,
    )

    pid = jax.process_index()
    part = f"{cfg.out_file}.part{pid}"
    ranges = []
    it = sim.iter_plans()
    base = 0
    # Noise keying must match the single-host runner byte-for-byte:
    # absolute epoch index = planner cursor at entry + global position.
    index0 = sim.next_block_index
    with open(part, "wb") as fp:
        while True:
            plans = list(itertools.islice(it, window_blocks))
            if not plans:
                break
            batch = collate_plans(plans, int_nco=int_nco)
            padded = pad_channels(batch.args, chan_shards)
            padded, pad = pad_batch(padded, mesh.shape["blocks"])
            local, sl = synthesize_multihost(
                padded, mesh, n_rows, batch.num_samples, fn=fn
            )
            # Drop padding blocks and record the global range this
            # process wrote for this window (blocks are quantized on
            # device: out_bits=bits halves the transfer for int8).
            lo = base + sl.start
            hi = min(base + sl.stop, base + len(plans))
            if hi > lo:
                out = local[: hi - lo]
                if strict:
                    # Strict sequential parity, same as the single-host
                    # runner: patch the sparse closed-form quantization
                    # flips of this process's own blocks.
                    out = np.ascontiguousarray(out)
                    for k in range(hi - lo):
                        plan = plans[sl.start + k]
                        idx_c, i16, q16, _, _ = seq_corrections(
                            plan, int_nco=int_nco
                        )
                        apply_corrections(out[k], bits, idx_c, i16, q16)
                if cfg.noise_std_lsb > 0.0:
                    out = np.ascontiguousarray(out)
                    for k in range(hi - lo):
                        out[k] = apply_awgn(
                            out[k], bits, cfg.noise_std_lsb,
                            cfg.noise_seed, 0, index0 + lo + k,
                        )
                out.tofile(fp)
                ranges.append([lo, hi])
            base += len(plans)
    with open(f"{part}.idx", "w") as fp:
        json.dump({"ranges": ranges, "total_blocks": base,
                   "samples_per_block": cfg.samples_per_epoch,
                   "bits": bits}, fp)
    return part


def merge_parts(out_file: str, n_parts: int) -> str:
    """Assemble part files (written by run_scenario_multihost) into the
    single interleaved IQ stream the reference produces."""
    import json

    segs = []
    total_blocks = None
    for pid in range(n_parts):
        part = f"{out_file}.part{pid}"
        with open(f"{part}.idx") as fp:
            idx = json.load(fp)
        total_blocks = idx["total_blocks"]
        dtype = np.int8 if idx["bits"] == 8 else np.int16
        blk = 2 * idx["samples_per_block"]
        data = np.fromfile(part, dtype=dtype)
        n_idx = sum(hi - lo for lo, hi in idx["ranges"])
        if data.size != n_idx * blk:
            raise ValueError(
                f"{part}: {data.size} values on disk, index claims {n_idx} "
                "blocks (truncated part file?)"
            )
        data = data.reshape(-1, blk)
        pos = 0
        for lo, hi in idx["ranges"]:
            segs.append((lo, data[pos : pos + (hi - lo)]))
            pos += hi - lo
    segs.sort(key=lambda s: s[0])
    with open(out_file, "wb") as fp:
        expect = 0
        for lo, d in segs:
            if lo != expect:
                raise ValueError(f"gap at block {expect}")
            d.tofile(fp)
            expect = lo + d.shape[0]
    if expect != total_blocks:
        raise ValueError(
            f"stream ends at block {expect}, scenario has {total_blocks} "
            "(missing trailing part data)"
        )
    return out_file
