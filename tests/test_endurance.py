"""Hour-scale endurance goldens (VERDICT r1 #2).

Opt-in: set GPSSIM_ENDURANCE=1 (runs ~30 min, writes a ~23 GB oracle
stream under the pytest tmp dir). The default suite gets the cheap
plans-only invariant sweep at the bottom.
"""

import os
import subprocess

import numpy as np
import pytest

from gpssim_tpu.checkpoint import load_checkpoint, save_checkpoint
from gpssim_tpu.config import SimConfig
from gpssim_tpu.ops.synth_seq import seq_available, synth_block_seq_native
from gpssim_tpu.scenario import Simulation

ENDURANCE = bool(os.environ.get("GPSSIM_ENDURANCE"))


def run_oracle(oracle_bin, nav, out, tmp, fixtures_dir, **kv):
    import shutil

    shutil.copy(
        os.path.join(fixtures_dir, "almanac_test.sem"),
        os.path.join(tmp, "almanac.sem"),
    )
    args = [oracle_bin, nav, os.path.join(tmp, out)]
    args += [f"{k}={v}" for k, v in kv.items()]
    subprocess.run(args, cwd=tmp, check=True, capture_output=True)
    return os.path.join(tmp, out)


@pytest.mark.golden
@pytest.mark.skipif(
    not ENDURANCE, reason="hour-scale endurance golden (GPSSIM_ENDURANCE=1)"
)
def test_endurance_multiset_golden(oracle_bin, fixtures_dir, tmp_path):
    """65 min vs the oracle, bit-exact, crossing TWO real ephemeris-set
    advances (gps.c:2878-2906) with almanac page cycling (5+ full 25-page
    wraps), plus mid-run checkpoint/resume verification at both a mid-set
    block and straight across the second advance."""
    if not seq_available():
        pytest.skip("native engine required for hour-scale synthesis")
    duration = 3900  # advances land at +120 s and +3810 s
    nav = f"{fixtures_dir}/brdc_endurance.22n"
    ref_path = run_oracle(
        oracle_bin, nav, "ref.bin", str(tmp_path), fixtures_dir,
        duration=duration, bits=8, iono=1, almanac=1,
        lat=35.681298, lon=139.766247, height=10.0,
    )
    ref = np.memmap(ref_path, dtype=np.int8, mode="r")
    blk = 600_000  # 2 * 300000 int8 per 0.1 s block
    n_blocks = duration * 10 - 1
    assert ref.size == n_blocks * blk

    cfg = SimConfig(
        nav_file=nav, duration_sec=float(duration), almanac_enable=True,
        almanac_file=f"{fixtures_dir}/almanac_test.sem",
    )
    sim = Simulation(cfg)
    advances = []
    ckpts = {20_000: str(tmp_path / "mid.npz"),
             37_900: str(tmp_path / "pre_adv2.npz")}
    last_ieph = sim.ieph
    bad = 0
    for i, plan in enumerate(sim.iter_plans()):
        if sim.ieph != last_ieph:
            advances.append(i)
            last_ieph = sim.ieph
        if i in ckpts:
            save_checkpoint(ckpts[i], sim)
        mine = synth_block_seq_native(plan, bits=8)
        if not np.array_equal(mine, ref[i * blk : (i + 1) * blk]):
            bad += 1
            assert bad < 5, f"block {i}: stream diverged"
    assert bad == 0, f"{bad} blocks differ"
    assert len(advances) == 2, f"expected 2 set advances, saw {advances}"
    assert advances[0] <= 1300 and 38000 <= advances[1] <= 38400, advances

    # Resume from the mid-set checkpoint: 200 blocks bit-identical.
    # (A snapshot taken while iterating block i captures "i+1 blocks
    # handed out", so the resumed stream starts at i+1.)
    _, sim_r = load_checkpoint(ckpts[20_000])
    it = sim_r.iter_plans()
    for j in range(200):
        i = 20_001 + j
        mine = synth_block_seq_native(next(it), bits=8)
        assert np.array_equal(mine, ref[i * blk : (i + 1) * blk]), i

    # Resume straight across the second set advance.
    _, sim_r2 = load_checkpoint(ckpts[37_900])
    it = sim_r2.iter_plans()
    for j in range(600):
        i = 37_901 + j
        mine = synth_block_seq_native(next(it), bits=8)
        assert np.array_equal(mine, ref[i * blk : (i + 1) * blk]), i
    assert sim_r2.ieph == sim.ieph  # advance replayed on resume


@pytest.mark.slow
def test_plan_invariants_1h_sweep(fixtures_dir):
    """One hour of plans through the kernel args conversion: the data-bit
    window and row-window invariants must never fire, and per-30 s frame
    word counters must stay inside the 60-word buffer."""
    import itertools

    from gpssim_tpu.ops.synth_jax import args_from_arrays
    from gpssim_tpu.parallel.blocks import collate_plans

    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_endurance.22n", duration_sec=3600.0,
        almanac_enable=False,
    )
    sim = Simulation(cfg)
    it = sim.iter_plans()
    n = 0
    while True:
        plans = list(itertools.islice(it, 300))
        if not plans:
            break
        batch = collate_plans(plans)  # runs args_from_arrays invariants
        assert batch.n_blocks == len(plans)
        for p in plans:
            assert 0 <= int(p.iword[p.active].max(initial=0)) < 60
        n += len(plans)
    assert n == 35_999
    # The sweep crossed a real set advance (~+120 s with this fixture).
    assert sim.ieph >= 1


@pytest.mark.golden
@pytest.mark.skipif(
    not ENDURANCE, reason="24 h plan sweep (GPSSIM_ENDURANCE=1)"
)
def test_plan_invariants_24h_sweep(fixtures_dir):
    """Full reference operating envelope (gps.h:39-43): 24 h of plans
    through the args conversion without any invariant firing."""
    import itertools

    from gpssim_tpu.parallel.blocks import collate_plans

    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=86400.0,
        almanac_enable=True,
        almanac_file=f"{fixtures_dir}/almanac_test.sem",
        parity_exact=False,  # closed-form chain: sweep planning speed
    )
    sim = Simulation(cfg)
    it = sim.iter_plans()
    n = 0
    while True:
        plans = list(itertools.islice(it, 600))
        if not plans:
            break
        collate_plans(plans)
        n += len(plans)
    assert n == 863_999
