"""Fleet mode: N scenarios through one batched device pipeline.

Bit-exactness contract: the fleet output for every member equals running
that member's scenario alone (the batch axis is pure stacking; strict
parity corrections are per-plan). The reference has no counterpart — its
hot loop is one stateful stream per process (gps.c:2767-2836)."""

import numpy as np
import pytest

from gpssim_tpu.config import (
    LocationConfig, SampleFormat, SimConfig, SynthBackend,
)
from gpssim_tpu.fleet import run_fleet
from gpssim_tpu.io.sinks import NullSink
from gpssim_tpu.runner import run_simulation


class CaptureSink(NullSink):
    def __init__(self):
        super().__init__()
        self.data = []

    def write(self, block):
        super().write(block)
        self.data.append(np.array(block))


def _cfg(fixtures_dir, **kw):
    kw.setdefault("backend", SynthBackend.JAX)
    return SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n",
        almanac_enable=False,
        **kw,
    )


def _fleet_cfgs(fixtures_dir):
    """Three members: two static locations and one dynamic circle, with
    unequal durations (member 1 ends two rounds early)."""
    return [
        _cfg(fixtures_dir, duration_sec=1.2),
        _cfg(fixtures_dir, duration_sec=0.9,
             location=LocationConfig(40.7128, -74.0060, 20.0)),
        _cfg(fixtures_dir, duration_sec=1.2,
             motion_file=f"{fixtures_dir}/circle_motion.csv"),
    ]


def test_fleet_matches_individual_runs(fixtures_dir):
    cfgs = _fleet_cfgs(fixtures_dir)
    fleet_sinks = [CaptureSink() for _ in cfgs]
    stats = run_fleet(cfgs, sinks=fleet_sinks, window=6)

    for cfg, sink, st in zip(cfgs, fleet_sinks, stats):
        solo = CaptureSink()
        run_simulation(cfg, sink=solo)
        assert st.blocks == solo.blocks == len(sink.data)
        for got, want in zip(sink.data, solo.data):
            assert np.array_equal(got, want)


def test_fleet_16bit_strict_parity(fixtures_dir):
    cfgs = [
        _cfg(fixtures_dir, duration_sec=0.6,
             sample_format=SampleFormat.SC16),
        _cfg(fixtures_dir, duration_sec=0.6,
             sample_format=SampleFormat.SC16,
             location=LocationConfig(48.8584, 2.2945, 35.0)),
    ]
    fleet_sinks = [CaptureSink() for _ in cfgs]
    run_fleet(cfgs, sinks=fleet_sinks, window=4)
    for cfg, sink in zip(cfgs, fleet_sinks):
        solo = CaptureSink()
        run_simulation(cfg, sink=solo)
        assert len(sink.data) == solo.blocks
        for got, want in zip(sink.data, solo.data):
            assert np.array_equal(got, want)


def test_fleet_sharded_over_mesh(fixtures_dir):
    """Fleet batches shard over a (blocks, chan) device mesh: every
    member's stream stays bit-identical to its solo single-device run
    (blocks axis traffic-free; chan psum is exact int32 addition)."""
    import jax

    from gpssim_tpu.parallel.shard import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU topology")
    mesh = make_mesh(4, 2)

    cfgs = _fleet_cfgs(fixtures_dir)
    fleet_sinks = [CaptureSink() for _ in cfgs]
    run_fleet(cfgs, sinks=fleet_sinks, window=6, mesh=mesh)
    for cfg, sink in zip(cfgs, fleet_sinks):
        solo = CaptureSink()
        run_simulation(cfg, sink=solo)
        assert len(sink.data) == solo.blocks
        for got, want in zip(sink.data, solo.data):
            assert np.array_equal(got, want)


def test_member_configs_derivation(fixtures_dir, tmp_path):
    """Roster rows derive per-member out_file names and noise seeds from
    the base config; explicit out_file columns pass through."""
    from gpssim_tpu.config import LocationConfig
    from gpssim_tpu.fleet import member_configs, parse_fleet_file

    roster = tmp_path / "r.csv"
    roster.write_text(
        "# comment\n"
        "1.0, 2.0, 3.0\n"
        "4.0, 5.0, 6.0, custom.bin\n"
    )
    rows = parse_fleet_file(str(roster))
    base = _cfg(fixtures_dir, out_file="fleet.bin", noise_std_lsb=2.0,
                noise_seed=40)
    cfgs = member_configs(base, rows)
    assert [c.out_file for c in cfgs] == ["fleet_m0.bin", "custom.bin"]
    assert [c.noise_seed for c in cfgs] == [40, 41]
    assert cfgs[0].location == LocationConfig(1.0, 2.0, 3.0)
    assert cfgs[1].location == LocationConfig(4.0, 5.0, 6.0)
    # base fields carry through untouched
    assert all(c.noise_std_lsb == 2.0 for c in cfgs)

    # tcp members take consecutive ports from the base address
    tcp_cfgs = member_configs(
        _cfg(fixtures_dir, sink="tcp", tcp_addr="127.0.0.1:5000"), rows
    )
    assert [c.tcp_addr for c in tcp_cfgs] == [
        "127.0.0.1:5000", "127.0.0.1:5001",
    ]
    with pytest.raises(ValueError, match="host:port"):
        member_configs(
            _cfg(fixtures_dir, sink="tcp", tcp_addr="badaddr"), rows
        )
    with pytest.raises(ValueError, match="iqfile, null, and tcp"):
        member_configs(_cfg(fixtures_dir, sink="hackrf"), rows)
    bad = tmp_path / "bad.csv"
    bad.write_text("1.0, x, 3.0\n")
    with pytest.raises(ValueError, match="non-numeric"):
        parse_fleet_file(str(bad))
    empty = tmp_path / "empty.csv"
    empty.write_text("# nothing\n")
    with pytest.raises(ValueError, match="no fleet members"):
        parse_fleet_file(str(empty))


def test_fleet_rejects_mismatched_statics(fixtures_dir):
    cfgs = [
        _cfg(fixtures_dir, duration_sec=0.3),
        _cfg(fixtures_dir, duration_sec=0.3,
             sample_format=SampleFormat.SC16),
    ]
    with pytest.raises(ValueError, match="sample_format"):
        run_fleet(cfgs)


def test_fleet_rejects_host_backend(fixtures_dir):
    with pytest.raises(ValueError, match="jax or pallas"):
        run_fleet([_cfg(fixtures_dir, backend=SynthBackend.NUMPY)])


def test_fleet_rejects_duplicate_default_targets(fixtures_dir):
    """Two members defaulting to the same out_file would truncate and
    interleave one stream — refused before any file is touched."""
    cfgs = [
        _cfg(fixtures_dir, duration_sec=0.3),
        _cfg(fixtures_dir, duration_sec=0.3,
             location=LocationConfig(1.0, 2.0, 3.0)),
    ]
    with pytest.raises(ValueError, match="share the same iqfile target"):
        run_fleet(cfgs)
    # Distinct paths (or explicit sinks) are fine — covered by the
    # bit-exactness tests above.


def test_live_min_blocks_ignores_finished_members():
    """Fleet pacing/lag attribution follows the slowest LIVE member: a
    shorter-duration member that wrote its full scenario must not pin
    the minimum (its frozen count would grow the lag metric without
    bound and fire a spurious whole-fleet failover), and an all-done
    fleet has nothing to pace."""
    from gpssim_tpu.fleet import _live_min_blocks
    from gpssim_tpu.runner import RunStats

    def st(n):
        s = RunStats()
        s.blocks = n
        return s

    totals = [10, 5, 10]
    assert _live_min_blocks([st(3), st(2), st(4)], totals) == 2
    # member 1 done: its frozen 5 no longer pins the minimum
    assert _live_min_blocks([st(7), st(5), st(6)], totals) == 6
    # all done
    assert _live_min_blocks([st(10), st(5), st(10)], totals) is None


def test_fleet_realtime_unequal_durations(fixtures_dir, monkeypatch):
    """A realtime fleet whose members end at different times must stream
    every member to ITS full duration (the early finisher neither stalls
    pacing nor trips the watchdog into treating the fleet as behind),
    byte-identical to offline solo runs."""
    from gpssim_tpu.ops.synth_seq import seq_available

    if not seq_available():
        pytest.skip("native engine unavailable")
    from tests.test_sinks import _LoopbackServer

    from gpssim_tpu.io.sinks import TcpSink

    durs = [1.2, 2.4, 3.6]
    cfgs = [
        _cfg(fixtures_dir, duration_sec=d, realtime=True, fifo_depth=8,
             sink="tcp", sample_rate=1_060_000,
             location=LocationConfig(34.0 + i, 138.0 + i, 5.0))
        for i, d in enumerate(durs)
    ]
    srvs = [_LoopbackServer() for _ in durs]
    sinks = [
        TcpSink(addr=f"127.0.0.1:{srv.port}", fifo_depth=8, pace=True,
                start_timeout_s=120.0)
        for srv in srvs
    ]
    stats = run_fleet(cfgs, sinks=sinks)
    for s, srv in zip(sinks, srvs):
        s.close()
        srv.join()
    import dataclasses

    for i, cfg in enumerate(cfgs):
        assert stats[i].blocks == cfg.num_epochs - 1, (
            f"member {i}: {stats[i].blocks} blocks"
        )
        ref_cfg = dataclasses.replace(
            cfg, realtime=False, backend=SynthBackend.NUMPY, sink="null",
        )
        solo = CaptureSink()
        run_simulation(ref_cfg, sink=solo)
        ref = b"".join(np.asarray(b).tobytes() for b in solo.data)
        assert bytes(srvs[i].received) == ref, f"member {i} stream"


def test_fleet_rejects_interactive_and_mixed_realtime(fixtures_dir):
    with pytest.raises(ValueError, match="interactive"):
        run_fleet([_cfg(fixtures_dir, duration_sec=0.3, interactive=True)])
    with pytest.raises(ValueError, match="realtime"):
        run_fleet([
            _cfg(fixtures_dir, duration_sec=0.3, realtime=True),
            _cfg(fixtures_dir, duration_sec=0.3,
                 location=LocationConfig(1.0, 2.0, 3.0)),
        ])
    # checkpoint_file is SUPPORTED since r5 (one fleet snapshot file) —
    # but members must agree on it.
    with pytest.raises(ValueError, match="checkpoint_file"):
        run_fleet([
            _cfg(fixtures_dir, duration_sec=0.3,
                 checkpoint_file="x.npz"),
            _cfg(fixtures_dir, duration_sec=0.3,
                 location=LocationConfig(1.0, 2.0, 3.0)),
        ])


def test_fleet_realtime_paced_tcp_failover_zero_underruns(fixtures_dir,
                                                          monkeypatch):
    """N concurrent paced TCP streams from ONE batched device pipeline
    (VERDICT r3 item 5): the device path is throttled below 1x
    deterministically, the fleet supervisor fails the whole pipeline
    over to the native engine, and every member streams its full paced
    TX with zero underruns, byte-identical to an offline strict run."""
    from gpssim_tpu.ops.synth_seq import seq_available

    if not seq_available():
        pytest.skip("native engine unavailable")
    import time as _time

    import gpssim_tpu.parallel.blocks as blocks_mod
    from tests.test_sinks import _LoopbackServer

    from gpssim_tpu.io.sinks import TcpSink

    # Throttle the dispatch pipeline's host stage (per-batch), which
    # stalls the device path below 1x deterministically.
    real_pack = blocks_mod.pack_args

    def slow_pack(args):
        _time.sleep(0.8)  # > the 0.4 s of signal/member per batch
        return real_pack(args)

    monkeypatch.setattr(blocks_mod, "pack_args", slow_pack)

    n = 3
    locs = [LocationConfig(35.0 + i, 139.0 + i, 10.0) for i in range(n)]
    # 1.06 Msps (wide-window kernel territory) rather than 3.0: under
    # the test env's 8 virtual XLA CPU devices their thread pools — and
    # the abandoned in-flight device batches still executing after
    # failover — contend with the single-core native tail, and the
    # zero-underrun contract needs decisive headroom (~3x at this rate)
    # to be deterministic under any suite-load pattern. The full-rate
    # 8-stream version runs on the TPU rig in bench.py's fleet section.
    cfgs = [
        _cfg(fixtures_dir, duration_sec=3.0, realtime=True,
             fifo_depth=8, location=locs[i], sink="tcp",
             sample_rate=1_060_000)
        for i in range(n)
    ]
    srvs = [_LoopbackServer() for _ in range(n)]
    # start_timeout covers the first JAX-CPU compile: the paced consumer
    # must not give up its start barrier (and count underruns) while the
    # throttled device path is still compiling its first batch.
    sinks = [
        TcpSink(addr=f"127.0.0.1:{srv.port}", fifo_depth=8, pace=True,
                start_timeout_s=120.0)
        for srv in srvs
    ]
    stats = run_fleet(cfgs, sinks=sinks)
    underruns = [s.underruns for s in sinks]
    received = []
    for s, srv in zip(sinks, srvs):
        s.close()
        srv.join()
        received.append(bytes(srv.received))

    assert stats[0].failovers == 1, stats[0].events
    assert any("failing over" in e for e in stats[0].events)
    assert stats[0].failover_latency_s is not None
    assert stats[0].failover_latency_s < 0.5 * 0.1 * cfgs[0].fifo_depth
    assert all(u == 0 for u in underruns), underruns
    # Every member's paced bytes == its offline strict-parity solo run.
    import dataclasses

    for i, cfg in enumerate(cfgs):
        ref_cfg = dataclasses.replace(
            cfg, realtime=False, backend=SynthBackend.NUMPY, sink="null",
        )
        solo = CaptureSink()
        run_simulation(ref_cfg, sink=solo)
        ref = b"".join(np.asarray(b).tobytes() for b in solo.data)
        assert received[i] == ref, f"member {i} stream != solo run"


def test_fleet_sink_init_failure_closes_earlier_sinks(fixtures_dir, tmp_path):
    """A failing sink init must not leak the sinks initialized before it."""
    opened = []

    class OkSink(NullSink):
        def init(self, cfg):
            super().init(cfg)
            opened.append(self)

        def close(self):
            self.closed = True
            super().close()

    class BadSink(NullSink):
        def init(self, cfg):
            raise OSError("unwritable")

    cfgs = [_cfg(fixtures_dir, duration_sec=0.3) for _ in range(2)]
    with pytest.raises(OSError, match="unwritable"):
        run_fleet(cfgs, sinks=[OkSink(), BadSink()])
    assert len(opened) == 1 and getattr(opened[0], "closed", False)


@pytest.mark.tpu
@pytest.mark.skipif(
    not __import__("os").environ.get("GPSSIM_FLEET50"),
    reason="50-member fleet run (GPSSIM_FLEET50=1, real TPU)",
)
def test_fleet_50_members_at_scale(fixtures_dir, tmp_path):
    """Fleet at the claimed scale (VERDICT r2 item 9): 50 receivers'
    worth of distinct scenarios through ONE batched device pipeline,
    every member's stream qa.py-verified at truth, aggregate and
    per-member rates recorded (stderr; captured into PERFORMANCE.md)."""
    import sys
    import time

    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("requires the real TPU chip (GPSSIM_TEST_TPU=1)")

    from gpssim_tpu.qa import verify_stream

    N = 50
    dur = 6.0
    cfgs = []
    for i in range(N):
        cfgs.append(_cfg(
            fixtures_dir,
            duration_sec=dur,
            backend=SynthBackend.PALLAS,
            location=LocationConfig(
                35.0 + 0.05 * (i % 10), 139.0 + 0.05 * (i // 10), 10.0 + i
            ),
            out_file=str(tmp_path / f"m{i:02d}.bin"),
            noise_seed=i,
        ))

    t0 = time.perf_counter()
    stats = run_fleet(cfgs, window=400)
    wall = time.perf_counter() - t0

    blocks_per_member = int(dur * 10) - 1
    total = sum(st.blocks for st in stats)
    assert total == N * blocks_per_member, total
    agg_sps = sum(st.samples for st in stats) / wall
    per_member_rt = (blocks_per_member * 0.1) / wall
    print(
        f"\nfleet50: {total} blocks in {wall:.2f}s = "
        f"{agg_sps/1e6:.0f} Msps aggregate, "
        f"{per_member_rt:.1f}x realtime PER MEMBER "
        f"({agg_sps/3e6:.0f}x aggregate)",
        file=sys.stderr,
    )

    # Every member's bytes verify against ITS OWN truth trajectory.
    for i, cfg in enumerate(cfgs):
        rep = verify_stream(cfg.out_file, cfg)
        assert rep.ok, f"member {i}: {rep}"
        assert rep.blocks == blocks_per_member
