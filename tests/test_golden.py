"""Golden parity tests against the compiled reference simulator.

The oracle (tools/oracle) is the unmodified reference engine built headless.
Parity contract: **bit-exact at both 8 and 16 bit in every configuration.**

The framework's kernels use closed-form phases (ops/plan.py) so blocks
parallelize; the strict-parity layer (ops/synth_seq.py) replays the
reference's *sequential* float64 phase accumulation natively — chaining
block-boundary carrier phase with reference semantics and patching the
sparse set of samples (≈0 per block) where the closed form quantizes a
chip/LUT index differently.  run_mine therefore asserts exact equality;
see tests/test_synth.py for the sequential engine's unit vectors.
"""

import os
import subprocess

import numpy as np
import pytest

from gpssim_tpu.config import LocationConfig, SampleFormat, SimConfig
from gpssim_tpu.ops.synth_numpy import quantize_iq
from gpssim_tpu.ops.synth_seq import synth_block_seq
from gpssim_tpu.scenario import Simulation

TOKYO = dict(lat=35.681298, lon=139.766247, height=10.0)


def run_oracle(oracle_bin, nav, out, tmp, fixtures_dir, **kv):
    args = [oracle_bin, nav, out] + [f"{k}={v}" for k, v in kv.items()]
    # almanac_read_file reads ./almanac.sem
    alm_src = os.path.join(fixtures_dir, "almanac_test.sem")
    alm_dst = os.path.join(tmp, "almanac.sem")
    if not os.path.exists(alm_dst):
        import shutil

        shutil.copy(alm_src, alm_dst)
    subprocess.run(args, cwd=tmp, check=True, capture_output=True)
    return os.path.join(tmp, out)


def run_mine(cfg, int_nco=False):
    sim = Simulation(cfg)
    bits = cfg.sample_format.value
    return np.concatenate(
        [
            quantize_iq(synth_block_seq(p, int_nco=int_nco), bits)
            for p in sim.iter_plans()
        ]
    )


def assert_parity(mine, ref_path, dtype, ctx=""):
    """Strict parity: every sample identical to the reference stream."""
    ref = np.fromfile(ref_path, dtype=dtype)
    assert len(mine) == len(ref), (ctx, len(mine), len(ref))
    if not np.array_equal(mine, ref):
        d = mine.astype(np.int32) - ref.astype(np.int32)
        bad = np.flatnonzero(d)
        raise AssertionError(
            f"{ctx}: {len(bad)} samples differ (first at {bad[:5]}, "
            f"max |diff| {np.abs(d).max()})"
        )


@pytest.mark.golden
def test_static_8bit(oracle_bin, fixtures_dir, tmp_path):
    nav = f"{fixtures_dir}/brdc_test.22n"
    ref = run_oracle(
        oracle_bin, nav, "ref.bin", str(tmp_path), fixtures_dir,
        duration=2, bits=8, iono=1, almanac=0, **TOKYO,
    )
    cfg = SimConfig(nav_file=nav, duration_sec=2.0, almanac_enable=False)
    mine = run_mine(cfg)
    ref_arr = np.fromfile(ref, dtype=np.int8)
    assert np.array_equal(mine, ref_arr), "8-bit static scenario must be bit-exact"


@pytest.mark.golden
def test_16bit_iono_almanac(oracle_bin, fixtures_dir, tmp_path):
    nav = f"{fixtures_dir}/brdc_test.22n"
    ref = run_oracle(
        oracle_bin, nav, "ref.bin", str(tmp_path), fixtures_dir,
        duration=3, bits=16, iono=1, almanac=1, **TOKYO,
    )
    cfg = SimConfig(
        nav_file=nav, duration_sec=3.0, almanac_enable=True,
        almanac_file=f"{fixtures_dir}/almanac_test.sem",
        sample_format=SampleFormat.SC16,
    )
    assert_parity(run_mine(cfg), ref, np.int16)


@pytest.mark.golden
@pytest.mark.parametrize(
    "loc",
    [
        dict(lat=-33.865143, lon=151.209900, height=58.0),  # Sydney
        dict(lat=78.223172, lon=15.626572, height=10.0),  # Svalbard
        dict(lat=-0.5, lon=179.9, height=0.0),  # equator/antimeridian
    ],
    ids=["southern", "high-lat", "antimeridian"],
)
def test_location_diversity(oracle_bin, fixtures_dir, tmp_path, loc):
    """Different geometry regimes (visibility sets, az/el quadrants,
    Klobuchar geomagnetic latitudes) must all stay bit-exact."""
    nav = f"{fixtures_dir}/brdc_test.22n"
    ref = run_oracle(
        oracle_bin, nav, "ref.bin", str(tmp_path), fixtures_dir,
        duration=1, bits=8, iono=1, almanac=0, **loc,
    )
    cfg = SimConfig(
        nav_file=nav, duration_sec=1.0, almanac_enable=False,
        location=LocationConfig(**loc),
    )
    ref_arr = np.fromfile(ref, dtype=np.int8)
    assert np.array_equal(run_mine(cfg), ref_arr)


@pytest.mark.golden
def test_iono_disabled(oracle_bin, fixtures_dir, tmp_path):
    """--disable-iono (spacecraft scenario) path, reference gps.c:1901-1903."""
    nav = f"{fixtures_dir}/brdc_test.22n"
    ref = run_oracle(
        oracle_bin, nav, "ref.bin", str(tmp_path), fixtures_dir,
        duration=2, bits=8, iono=0, almanac=0, **TOKYO,
    )
    cfg = SimConfig(
        nav_file=nav, duration_sec=2.0, almanac_enable=False,
        ionosphere_enable=False,
    )
    assert_parity(run_mine(cfg), ref, np.int8)


@pytest.mark.golden
def test_motion_file(oracle_bin, fixtures_dir, tmp_path):
    nav = f"{fixtures_dir}/brdc_test.22n"
    motion = f"{fixtures_dir}/circle_motion.csv"
    ref = run_oracle(
        oracle_bin, nav, "ref.bin", str(tmp_path), fixtures_dir,
        duration=3, bits=8, iono=1, almanac=0, motion=motion,
    )
    cfg = SimConfig(
        nav_file=nav, duration_sec=3.0, almanac_enable=False,
        motion_file=motion, location=LocationConfig(0.0, 0.0, 0.0),
    )
    assert_parity(run_mine(cfg), ref, np.int8)


@pytest.mark.golden
def test_rinex3_16bit(oracle_bin, fixtures_dir, tmp_path):
    nav = f"{fixtures_dir}/brdc_test_v3.22n"
    ref = run_oracle(
        oracle_bin, nav, "ref.bin", str(tmp_path), fixtures_dir,
        duration=3, bits=16, iono=1, almanac=1, rinex3=1, **TOKYO,
    )
    cfg = SimConfig(
        nav_file=nav, rinex_version=3, duration_sec=3.0,
        almanac_enable=True, almanac_file=f"{fixtures_dir}/almanac_test.sem",
        sample_format=SampleFormat.SC16,
    )
    assert_parity(run_mine(cfg), ref, np.int16)


@pytest.mark.golden
def test_target_offset(oracle_bin, fixtures_dir, tmp_path):
    nav = f"{fixtures_dir}/brdc_test.22n"
    ref = run_oracle(
        oracle_bin, nav, "ref.bin", str(tmp_path), fixtures_dir,
        duration=2, bits=8, iono=1, almanac=0,
        tdist=1500.0, tbear=45.0, theight=30.0, **TOKYO,
    )
    from gpssim_tpu.config import TargetConfig

    cfg = SimConfig(
        nav_file=nav, duration_sec=2.0, almanac_enable=False,
        target=TargetConfig(
            distance=1500.0, bearing_millideg=45000.0, height=30.0, valid=True
        ),
    )
    assert_parity(run_mine(cfg), ref, np.int8)


@pytest.mark.golden
def test_interactive_motion(oracle_bin, fixtures_dir, tmp_path):
    """Interactive velocity integration (gps.c:2714-2729): constant
    bearing/speed/vertical-speed kinematics held for a run that crosses
    the 30 s nav-regen + channel realloc (which uses xyz[0], gps.c:2909,
    while the live position has drifted ~150 m away). Exercises the
    NEU-transpose quirk and the per-epoch xyz[i-1]+v*0.1 accumulation
    against the unmodified reference engine."""
    nav = f"{fixtures_dir}/brdc_test.22n"
    ref = run_oracle(
        oracle_bin, nav, "ref.bin", str(tmp_path), fixtures_dir,
        duration=31, bits=8, iono=1, almanac=0,
        interactive=1, speed=5.0, tbear=47.0, vspeed=0.5, **TOKYO,
    )
    cfg = SimConfig(
        nav_file=nav, duration_sec=31.0, almanac_enable=False,
        interactive=True,
    )
    sim = Simulation(cfg)
    sim.set_motion(bearing_deg=47.0, velocity=5.0, vertical_speed=0.5)
    # Native sequential engine: byte-identical to the NumPy parity path
    # (asserted by test_synth_seq) and ~10x faster — this is the longest
    # default-suite golden (31 s of signal to cross the 30 s regen).
    from gpssim_tpu.ops.synth_seq import seq_available, synth_block_seq_native

    if seq_available():
        mine = np.concatenate(
            [synth_block_seq_native(p, bits=8) for p in sim.iter_plans()]
        )
    else:
        mine = np.concatenate(
            [quantize_iq(synth_block_seq(p), 8) for p in sim.iter_plans()]
        )
    assert_parity(mine, ref, np.int8)


@pytest.mark.golden
def test_start_time_and_overwrite(oracle_bin, fixtures_dir, tmp_path):
    """Scenario start within the ephemeris span, and the '--start now'
    time-overwrite relocation (gps.c:2507-2608)."""
    from gpssim_tpu.core.ephemeris import nav_time_span, read_rinex_nav
    from gpssim_tpu.core.gpstime import gps2date, inc_gps_time

    nav = f"{fixtures_dir}/brdc_test.22n"
    gmin, _ = nav_time_span(read_rinex_nav(nav, version=2))

    for shift, overwrite in ((1800.0, 0), (-364 * 86400.0, 1)):
        t = gps2date(inc_gps_time(gmin, shift))
        start_s = f"{t.y}/{t.m}/{t.d},{t.hh}:{t.mm}:{t.sec:.0f}"
        ref = run_oracle(
            oracle_bin, nav, f"ref{overwrite}.bin", str(tmp_path),
            fixtures_dir, duration=2, bits=8, iono=1, almanac=0,
            start=start_s, overwrite=overwrite, **TOKYO,
        )
        cfg = SimConfig(
            nav_file=nav, duration_sec=2.0, almanac_enable=False,
            start=t, time_overwrite=bool(overwrite),
        )
        ref_arr = np.fromfile(ref, dtype=np.int8)
        assert np.array_equal(run_mine(cfg), ref_arr), (
            f"start={start_s} overwrite={overwrite}"
        )


@pytest.mark.golden
def test_int_nco_carrier_mode(oracle_bin, fixtures_dir, tmp_path):
    """Integer-NCO carrier mode vs the reference compiled WITHOUT
    FLOAT_CARR_PHASE (gps.h:17 removed; 9.16 fixed-point NCO path,
    gps.h:221-223, gps.c:2745-2828)."""
    from gpssim_tpu.config import CarrierMode

    intnco_bin = oracle_bin + "-intnco"
    if not os.path.exists(intnco_bin):
        pytest.skip("int-NCO oracle not built")
    nav = f"{fixtures_dir}/brdc_test.22n"
    ref = run_oracle(
        intnco_bin, nav, "ref.bin", str(tmp_path), fixtures_dir,
        duration=2, bits=8, iono=1, almanac=0, **TOKYO,
    )
    cfg = SimConfig(
        nav_file=nav, duration_sec=2.0, almanac_enable=False,
        carrier_mode=CarrierMode.INT_NCO,
    )
    ref_arr = np.fromfile(ref, dtype=np.int8)
    assert np.array_equal(run_mine(cfg, int_nco=True), ref_arr), (
        "int-NCO mode must be bit-exact"
    )


@pytest.mark.golden
def test_everything_on(oracle_bin, fixtures_dir, tmp_path):
    """Combined configuration: RINEX v3 + motion file + almanac + iono +
    16-bit — the feature interactions in one run."""
    nav = f"{fixtures_dir}/brdc_test_v3.22n"
    motion = f"{fixtures_dir}/circle_motion.csv"
    ref = run_oracle(
        oracle_bin, nav, "ref.bin", str(tmp_path), fixtures_dir,
        duration=2, bits=16, iono=1, almanac=1, rinex3=1, motion=motion,
    )
    cfg = SimConfig(
        nav_file=nav, rinex_version=3, duration_sec=2.0,
        almanac_enable=True, almanac_file=f"{fixtures_dir}/almanac_test.sem",
        motion_file=motion, sample_format=SampleFormat.SC16,
        location=LocationConfig(0.0, 0.0, 0.0),
    )
    assert_parity(run_mine(cfg), ref, np.int16)


@pytest.mark.golden
def test_fuzz_random_scenarios(oracle_bin, fixtures_dir, tmp_path):
    """Seeded random draws over (location, iono, bits, target, start):
    combinations the fixed matrix doesn't cover must stay within the
    parity contract."""
    import random

    from gpssim_tpu.config import TargetConfig
    from gpssim_tpu.core.ephemeris import nav_time_span, read_rinex_nav
    from gpssim_tpu.core.gpstime import gps2date, inc_gps_time

    rng = random.Random(20260816)
    nav = f"{fixtures_dir}/brdc_test.22n"
    gmin, _ = nav_time_span(read_rinex_nav(nav, version=2))
    for trial in range(12):
        loc = dict(
            lat=rng.uniform(-75.0, 75.0),
            lon=rng.uniform(-180.0, 180.0),
            height=rng.uniform(-50.0, 20000.0),
        )
        bits = rng.choice((8, 16))
        iono = rng.choice((0, 1))
        extra: dict = {}
        cfg_kw: dict = {}
        if rng.random() < 0.4:
            dist = rng.uniform(10.0, 5000.0)
            bear = rng.uniform(0.0, 360.0)
            th = rng.uniform(-50.0, 50.0)
            extra.update(tdist=dist, tbear=bear, theight=th)
            cfg_kw["target"] = TargetConfig(dist, bear * 1000.0, th, True)
        if rng.random() < 0.4:
            shift = rng.uniform(60.0, 3000.0)
            t = gps2date(inc_gps_time(gmin, round(shift)))
            extra["start"] = f"{t.y}/{t.m}/{t.d},{t.hh}:{t.mm}:{t.sec:.0f}"
            cfg_kw["start"] = t
        ref = run_oracle(
            oracle_bin, nav, f"ref{trial}.bin", str(tmp_path), fixtures_dir,
            duration=1, bits=bits, iono=iono, almanac=0, **loc, **extra,
        )
        cfg = SimConfig(
            nav_file=nav, duration_sec=1.0, almanac_enable=False,
            ionosphere_enable=bool(iono),
            sample_format=SampleFormat.SC16 if bits == 16 else SampleFormat.SC08,
            location=LocationConfig(**loc), **cfg_kw,
        )
        dtype = np.int16 if bits == 16 else np.int8
        assert_parity(
            run_mine(cfg), ref, dtype,
            ctx=f"trial {trial}: {loc} bits={bits} iono={iono} {extra}",
        )


@pytest.mark.golden
@pytest.mark.slow
def test_nav_regen_30s_crossing(oracle_bin, fixtures_dir, tmp_path):
    """Cross the 30 s nav-message regeneration + reallocation boundary."""
    nav = f"{fixtures_dir}/brdc_test.22n"
    ref = run_oracle(
        oracle_bin, nav, "ref.bin", str(tmp_path), fixtures_dir,
        duration=32, bits=8, iono=1, almanac=1, **TOKYO,
    )
    cfg = SimConfig(
        nav_file=nav, duration_sec=32.0, almanac_enable=True,
        almanac_file=f"{fixtures_dir}/almanac_test.sem",
    )
    assert_parity(run_mine(cfg), ref, np.int8)


@pytest.mark.golden
def test_nav_regen_30s_crossing_smoke(oracle_bin, fixtures_dir, tmp_path):
    """Default-suite smoke of the slow 30 s-crossing golden (VERDICT r4
    item 6): the same 32 s scenario (nav regen + reallocation boundary,
    iono + almanac pages) oracle-diffed bit-exactly, synthesized by the
    native engine instead of the NumPy parity path."""
    from tests.helpers import strict_gen_backend

    from gpssim_tpu.config import SynthBackend

    if strict_gen_backend() is not SynthBackend.NATIVE:
        pytest.skip("native engine unavailable")
    nav = f"{fixtures_dir}/brdc_test.22n"
    ref = run_oracle(
        oracle_bin, nav, "ref.bin", str(tmp_path), fixtures_dir,
        duration=32, bits=8, iono=1, almanac=1, **TOKYO,
    )
    cfg = SimConfig(
        nav_file=nav, duration_sec=32.0, almanac_enable=True,
        almanac_file=f"{fixtures_dir}/almanac_test.sem",
        backend=SynthBackend.NATIVE,
        out_file=str(tmp_path / "mine.bin"), sink="iqfile",
    )
    from gpssim_tpu.runner import run_simulation

    run_simulation(cfg)
    a = np.fromfile(cfg.out_file, dtype=np.int8)
    b = np.fromfile(ref, dtype=np.int8)
    assert a.size == b.size and np.array_equal(a, b)
