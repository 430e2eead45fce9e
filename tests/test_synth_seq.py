"""Unit vectors for the sequential-parity engine (ops/synth_seq.py).

The golden suite proves synth_block_seq bit-exact against the compiled
reference end-to-end; these tests localize the engine's pieces against
pure-Python replays of the reference recurrences (gps.c:2789, 2820-2826)
so a regression fails here, not as "some sample differs somewhere".
"""

import numpy as np
import pytest

from gpssim_tpu.ops.plan import BlockPlan
from gpssim_tpu.ops.synth_numpy import synth_block_numpy
from gpssim_tpu.ops.synth_seq import (
    apply_corrections,
    carrier_chain,
    seq_available,
    seq_corrections,
    synth_block_seq,
)

pytestmark = pytest.mark.skipif(
    not seq_available(), reason="native sequential engine unavailable"
)

CA_LEN = 1023.0


def python_carr_chain(carr0, f_carr, num_samples, delt):
    """Reference carrier recurrence (gps.c:2820-2826), plain Python floats."""
    K = len(f_carr)
    out = np.empty((K + 1, len(carr0)))
    ph = [float(p) for p in carr0]
    for j in range(K):
        out[j] = ph
        dp = [float(f) * delt for f in f_carr[j]]
        for _ in range(num_samples):
            for c in range(len(ph)):
                p = ph[c] + dp[c]
                if p >= 1.0:
                    p -= 1.0
                elif p < 0.0:
                    p += 1.0
                ph[c] = p
        out[K if j == K - 1 else j + 1] = ph  # row j+1 start == row j end
    out[K] = ph
    return out


def test_carrier_chain_matches_python_replay():
    rng = np.random.default_rng(7)
    C, K, N = 3, 2, 20_000
    delt = 1.0 / 2.6e6
    carr0 = rng.uniform(0.0, 1.0, C)
    f_carr = rng.uniform(-4200.0, 4200.0, (K, C))
    f_carr[:, 1] = 0.0  # inactive-slot convention: exact passthrough
    got = carrier_chain(carr0, f_carr, N, delt)
    want = python_carr_chain(carr0, f_carr, N, delt)
    assert np.array_equal(got, want)  # bit-exact, not allclose
    assert got[K, 1] == carr0[1]


def make_plan(
    num_samples,
    delt,
    code_phase,
    f_code,
    carr_phase=0.3,
    f_carr=1000.0,
    gain=250.0,
    seed=0,
):
    """Single-active-channel synthetic plan with an alternating C/A table
    (so every chip-index flip changes the output) and random nav words."""
    rng = np.random.default_rng(seed)
    C = 2  # slot 1 inactive: engine must skip it
    z = np.zeros(C)
    ca = np.tile(
        (np.arange(1023, dtype=np.int8) & 1), (C, 1)
    )  # 0,1,0,1,... alternating
    dwrd = rng.integers(0, 1 << 30, size=(C, 60), dtype=np.int64).astype(
        np.uint32
    )
    return BlockPlan(
        num_samples=num_samples,
        delt=delt,
        active=np.array([True, False]),
        code_phase=z + code_phase,
        f_code=z + f_code,
        carr_phase=z + carr_phase,
        f_carr=z + f_carr,
        carr_phase_i=np.zeros(C, dtype=np.uint32),
        carr_step_i=np.zeros(C, dtype=np.int32) + 40000,
        gain=z + gain,
        iword=np.zeros(C, dtype=np.int64) + 3,
        ibit=np.zeros(C, dtype=np.int64) + 7,
        icode=np.zeros(C, dtype=np.int64) + 11,
        prn=np.array([5, 0], dtype=np.int64),
        ca=ca,
        dwrd=dwrd,
    )


def python_seq_capture(plan, c, targets):
    """Sequential chip/LUT/data-bit at each target sample, one full replay
    of the reference recurrences (gps.c:2789, 2820-2826)."""
    targets = sorted(int(t) for t in targets)
    cp = float(plan.code_phase[c])
    dc = float(plan.f_code[c]) * plan.delt
    ph = float(plan.carr_phase[c])
    dp = float(plan.f_carr[c]) * plan.delt
    iword, ibit, icode = (
        int(plan.iword[c]), int(plan.ibit[c]), int(plan.icode[c])
    )
    dwrd = plan.dwrd[c]
    bit = int((int(dwrd[iword]) >> (29 - ibit)) & 1) * 2 - 1
    out = {}
    ti = 0
    for n in range(targets[-1] + 1):
        if ti < len(targets) and n == targets[ti]:
            out[n] = (int(cp), int(np.floor(ph * 512.0)), bit)
            ti += 1
        cp += dc
        if cp >= CA_LEN:
            cp -= CA_LEN
            icode += 1
            if icode >= 20:
                icode = 0
                ibit += 1
                if ibit >= 30:
                    ibit = 0
                    iword += 1
                bit = int((int(dwrd[iword]) >> (29 - ibit)) & 1) * 2 - 1
        ph += dp
        if ph >= 1.0:
            ph -= 1.0
        elif ph < 0.0:
            ph += 1.0
    return out


def divergent_plan(N=64):
    """A plan with a GUARANTEED sequential-vs-closed-form chip flip.

    With chained block starts the natural in-block flip rate is ~1e-11 per
    sample (random-walk rounding ~1e-13 chips against uniformly-placed
    boundaries), so instead of searching real blocks this places a chip
    boundary B inside the ulp-scale window where the two rounding paths
    land on opposite sides: cp0 is swept a few ulp around B - n*dc until
    int(sequential cp_n) != int(closed-form cp0 + fl(n*dc)).  Fully
    deterministic — pure f64 arithmetic, delt=1.0 so dc == f_code."""
    m = round(0.3935 * 2.0**43)
    dc = (m + 0.4995) * 2.0**-43
    ulp = 2.0**-43
    for B in range(651, 757, 7):
        for k in range(-12, 13):
            cp0 = (B - 4 * dc) + k * ulp
            if cp0 != cp0 or cp0 < 0:
                continue
            cp = cp0
            for n in range(1, 9):
                cp = cp + dc
                cf = cp0 + float(n) * dc
                if int(cp) != int(cf):
                    return make_plan(
                        N, 1.0, cp0, dc, carr_phase=0.25, f_carr=0.0
                    )
    return None


_FOUND = None


def _found():
    global _FOUND
    if _FOUND is None:
        plan = divergent_plan()
        assert plan is not None, "ulp sweep found no chip-boundary flip"
        idx, i16, q16, end_carr, _ = seq_corrections(plan, want_end=True)
        _FOUND = (plan, idx, i16, q16, end_carr)
    return _FOUND


def test_divergent_sample_found_and_patched_value_correct():
    """The searched-for boundary event must exist, and the patched value
    must equal an independent pure-Python sequential replay."""
    from gpssim_tpu.core.constants import COS_TABLE_512, SIN_TABLE_512

    plan, idx, i16, q16, end_carr = _found()
    assert len(idx) > 0, (
        "biased-rounding construction produced no divergence — margins or "
        "screen logic changed?"
    )
    caps = python_seq_capture(plan, 0, idx)
    for k, n in enumerate(idx):
        chip, itab, bit = caps[int(n)]
        s = float(bit * (int(plan.ca[0, chip]) * 2 - 1))
        # (short) cast wraps mod 2^16 (gps.c int accumulator -> int16 store)
        wrap16 = lambda v: np.array([int(v)], dtype=np.int64).astype(np.int16)[0]
        exp_i = wrap16(np.trunc(s * COS_TABLE_512[itab] * plan.gain[0]))
        exp_q = wrap16(np.trunc(s * SIN_TABLE_512[itab] * plan.gain[0]))
        assert i16[k] == exp_i and q16[k] == exp_q, n
    # And the full patched block: equals closed form everywhere else.
    out = synth_block_seq(plan)
    cf = synth_block_numpy(plan)
    d = np.flatnonzero(out != cf)
    assert set(d // 2) == set(int(v) for v in idx)


def test_end_carr_matches_chain():
    """gseq_diff_block's end-of-block carrier equals gseq_carr_chain's."""
    plan, _, _, _, end_carr = _found()
    chain = carrier_chain(
        plan.carr_phase, plan.f_carr[None, :], plan.num_samples, plan.delt
    )
    assert chain[1, 0] == end_carr[0]
    # inactive slot passes through untouched
    assert end_carr[1] == plan.carr_phase[1]


def test_int_nco_mode_runs_clean():
    """Int-NCO carrier is exact by construction; only code-phase events can
    fire, and the machinery must accept the mode."""
    plan = make_plan(100_000, 1.0 / 2.6e6, 512.25, 1.023e6 + 1.5)
    idx, i16, q16, end_carr, end_carr_i = seq_corrections(
        plan, int_nco=True, want_end=True
    )
    out = synth_block_seq(plan, int_nco=True)
    cf = synth_block_numpy(plan, int_nco=True)
    d = np.flatnonzero(out != cf)
    assert set(d // 2) == set(int(v) for v in idx)
    # NCO end phase: exact closed form
    assert end_carr_i[0] == plan.end_carr_phase_i()[0]


def test_apply_corrections_readonly_and_8bit():
    iq16 = np.arange(8, dtype=np.int16)
    iq16.setflags(write=False)
    idx = np.array([1], dtype=np.int64)
    out = apply_corrections(
        iq16, 16, idx, np.array([-300], np.int16), np.array([77], np.int16)
    )
    assert out is not iq16 and out[2] == -300 and out[3] == 77
    assert iq16[2] == 2  # original untouched
    iq8 = np.zeros(8, dtype=np.int8)
    apply_corrections(
        iq8, 8, idx, np.array([-300], np.int16), np.array([77], np.int16)
    )
    assert iq8[2] == (-300 >> 4) and iq8[3] == (77 >> 4)
    # empty idx: identity, even on read-only input
    same = apply_corrections(iq16, 16, idx[:0], idx[:0], idx[:0])
    assert same is iq16


def test_invalid_plan_raises():
    plan = make_plan(1000, 1.0 / 2.6e6, 0.0, 1.023e6)
    plan.iword = plan.iword + 60  # out of range
    with pytest.raises(ValueError):
        seq_corrections(plan)


def test_midblock_word_overflow_rejected_without_end_walk():
    """A plan whose data-word cascade overflows word 59 mid-block must be
    rejected in the lazy (want_end=False) production mode too — the
    closed-form validation replaces the skipped tail walk's check."""
    # iword/ibit/icode at the very end of the message; several code
    # wraps inside the block push the cascade past word 59.
    plan = make_plan(60_000, 1.0 / 2.6e6, 0.0, 1.023e6)
    plan.iword[0], plan.ibit[0], plan.icode[0] = 59, 29, 19
    for want_end in (False, True):
        with pytest.raises(ValueError, match="invalid block plan"):
            seq_corrections(plan, want_end=want_end)


def test_native_full_synth_matches_patched_numpy(fixtures_dir):
    """gseq_synth_block (full native sequential hot loop) must be
    bit-identical to the numpy-closed-form + sparse-patch path on real
    scenario blocks, at 16 and 8 bit, both carrier modes."""
    from gpssim_tpu.config import SimConfig
    from gpssim_tpu.ops.synth_numpy import quantize_iq
    from gpssim_tpu.ops.synth_seq import synth_block_seq_native
    from gpssim_tpu.scenario import Simulation

    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=0.5,
        almanac_enable=False,
    )
    for int_nco in (False, True):
        sim = Simulation(cfg)
        for plan in sim.iter_plans():
            want16 = synth_block_seq(plan, int_nco=int_nco)
            got16 = synth_block_seq_native(plan, int_nco=int_nco, bits=16)
            assert np.array_equal(want16, got16)
            got8 = synth_block_seq_native(plan, int_nco=int_nco, bits=8)
            assert np.array_equal(quantize_iq(want16, 8), got8)


def test_seq_corrections_window_matches_per_plan(fixtures_dir, monkeypatch):
    """The window-batched native screen (one call per dispatch window,
    blocks fanned over threads) must return exactly the per-plan
    results — on real scenario windows, on a window containing a
    guaranteed-divergent plan, and under a forced threaded schedule."""
    from gpssim_tpu.config import SimConfig
    from gpssim_tpu.ops.synth_seq import seq_corrections_window
    from gpssim_tpu.scenario import Simulation

    cfg = SimConfig(
        nav_file=f"{fixtures_dir}/brdc_test.22n", duration_sec=1.0,
        almanac_enable=False,
    )
    for int_nco in (False, True):
        plans = list(Simulation(cfg).iter_plans())
        win = seq_corrections_window(plans, int_nco=int_nco)
        assert len(win) == len(plans)
        for p, (idx, i16, q16) in zip(plans, win):
            a, b, c, _, _ = seq_corrections(p, int_nco=int_nco)
            assert np.array_equal(idx, a)
            assert np.array_equal(i16, b)
            assert np.array_equal(q16, c)

    # Window with guaranteed non-empty corrections, threads forced on.
    plan, idx, i16, q16, _ = _found()
    monkeypatch.setenv("GPSSIM_CHAIN_THREADS", "3")
    win = seq_corrections_window([plan, plan, plan])
    for got_idx, got_i, got_q in win:
        assert np.array_equal(got_idx, idx)
        assert np.array_equal(got_i, i16)
        assert np.array_equal(got_q, q16)


def test_native_full_synth_on_divergent_plan():
    """On the constructed boundary-flip plan the native full synth must
    agree with the patched closed form (i.e., both sequential-exact)."""
    plan, idx, _, _, _ = _found()
    assert len(idx) > 0
    from gpssim_tpu.ops.synth_seq import synth_block_seq_native

    assert np.array_equal(synth_block_seq(plan), synth_block_seq_native(plan))


def test_carr_advance_fast_forward_matches_brute():
    """The binade fast-forward (carr_advance_n) must be bit-identical to
    the brute per-sample recurrence for random and adversarial
    (phase, doppler-step, N) draws — the planner's throughput rests on it
    (one serial chain per channel per block)."""
    import ctypes

    from gpssim_tpu.io import native as native_mod

    lib = native_mod._load()
    for f in ("gseq_carr_advance_brute", "gseq_carr_advance_fast"):
        fn = getattr(lib, f)
        fn.restype = None
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_long
        ]

    def run(fn, p, dp, n):
        v = ctypes.c_double(p)
        fn(ctypes.byref(v), float(dp), int(n))
        return v.value

    rng = np.random.default_rng(20260817)
    cases = []
    for _ in range(1500):
        p = rng.uniform(0.0, 1.0)
        mag = 10.0 ** rng.uniform(-9, np.log10(2e-3))
        cases.append((p, mag * (1 if rng.random() < 0.5 else -1),
                      int(rng.integers(1, 5000))))
    specs = [0.0, 1e-300, 2.0**-52, 0.5, float(np.nextafter(0.5, 0)),
             float(np.nextafter(1, 0)), 0.9999999]
    dspecs = [0.0, 2.0**-53, -(2.0**-53), 1.5e-4, -1.5e-4, 2.0**-20,
              2.0**-20 + 2.0**-53, 0.001953125, 2e-3, -2e-3]
    cases += [(p, dp, 777) for p in specs for dp in dspecs]
    # Binade-bottom edges: a negative sub-ulp residual in (0.25, 0.5) ulp
    # at an exact power of two rounds into the finer binade BELOW the
    # progression (fl(0.5 - 0.4*2^-53*...) != 0.5) — both the fixed-point
    # shortcut and a segment arriving exactly at the bottom must defer to
    # the scalar step.
    cases += [
        (0.5, -0.4 * 2.0**-53, 1), (0.5, -0.4 * 2.0**-53, 100),
        (0.25, -0.3 * 2.0**-54, 5), (0.5, -0.2 * 2.0**-53, 10),
        (0.5, 0.4 * 2.0**-53, 10),
        (0.5 + 3 * 2.0**-53, -1.4 * 2.0**-53, 3),      # arrival at bottom
        (0.5 + 3 * 2.0**-53, -1.4 * 2.0**-53, 50),
        (0.5 + 30000 * 2.0**-53, -1.4 * 2.0**-53, 30000),
    ]
    cases += [
        (rng.uniform(0, 1), rng.uniform(-1.5e-3, 1.5e-3), 300_000)
        for _ in range(20)
    ]
    for p, dp, n in cases:
        a = run(lib.gseq_carr_advance_brute, p, dp, n)
        b = run(lib.gseq_carr_advance_fast, p, dp, n)
        assert a == b, (p.hex(), float(dp).hex(), n, a, b)


def fuzz_plan(rng, N, delt, *, adversarial=None):
    """Random multi-channel plan over the full parameter envelope."""
    C = 16
    active = rng.random(C) < 0.8
    active[0] = True
    f0 = 1.023e6
    dopp = rng.uniform(-4200.0, 4200.0, C)
    plan = BlockPlan(
        num_samples=N,
        delt=delt,
        active=active,
        code_phase=rng.uniform(0.0, 1023.0, C),
        f_code=f0 + dopp * (f0 / 1575.42e6),
        carr_phase=rng.uniform(0.0, 1.0, C),
        f_carr=dopp,
        carr_phase_i=rng.integers(0, 1 << 32, C, dtype=np.int64).astype(
            np.uint32
        ),
        carr_step_i=rng.integers(-300000, 300000, C).astype(np.int32),
        gain=rng.uniform(50.0, 350.0, C),
        iword=rng.integers(0, 58, C),
        ibit=rng.integers(0, 30, C),
        icode=rng.integers(0, 20, C),
        prn=np.arange(1, C + 1, dtype=np.int64),
        ca=rng.integers(0, 2, (C, 1023)).astype(np.int8),
        dwrd=rng.integers(0, 1 << 30, (C, 60)).astype(np.uint32),
    )
    if adversarial == "edges":
        # Park channels on the exact edges the segmented screen must
        # handle scalar: chip-wrap imminence, binade bottoms, zero phase,
        # fixed-point and tie-prone Doppler steps.
        plan.code_phase[0] = 1023.0 - 1e-7
        plan.code_phase[1] = np.nextafter(1023.0, 0.0)
        plan.carr_phase[1] = 0.0
        plan.carr_phase[2] = 0.5                    # binade bottom
        plan.f_carr[2] = -0.4 * 2.0**-53 / delt     # sub-ulp negative
        plan.carr_phase[3] = 0.5 + 3 * 2.0**-53
        plan.f_carr[3] = -1.4 * 2.0**-53 / delt     # walks onto the bottom
        plan.carr_phase[4] = 2.0**-30               # tiny: many binades up
        plan.f_carr[4] = abs(plan.f_carr[4]) + 1.0
        plan.carr_phase[5] = np.nextafter(1.0, 0.0)  # wrap imminent
        plan.code_phase[6] = 0.0
        plan.f_carr[6] = 0.0                        # inactive-style hold
        plan.carr_phase[7] = 0.25
        plan.f_carr[7] = -(2.0**-20 + 2.0**-53) / delt
    return plan


@pytest.mark.parametrize("threads", ["1", "5"])
def test_fast_screen_matches_ref_screen_fuzz(threads, monkeypatch):
    """gseq_diff_block (binade-segment fast path) must produce EXACTLY the
    same corrections and end state as gseq_diff_block_ref (sample-major
    float replay) on random and adversarial plans, both carrier modes —
    under the serial AND the channel-threaded walk schedule."""
    monkeypatch.setenv("GPSSIM_CHAIN_THREADS", threads)
    rng = np.random.default_rng(20260817)
    plans = []
    for delt in (1.0 / 1.023e6, 1.0 / 2.046e6, 1.0 / 2.6e6, 1.0 / 10e6):
        for _ in range(6):
            plans.append(fuzz_plan(rng, 20_000, delt))
        plans.append(fuzz_plan(rng, 20_000, delt, adversarial="edges"))
    plans.append(fuzz_plan(rng, 260_000, 1.0 / 2.6e6))  # full-size block
    plans.append(fuzz_plan(rng, 260_000, 1.0 / 2.6e6, adversarial="edges"))
    plans.append(divergent_plan())  # guaranteed >= 1 correction
    n_corr = 0
    for i, plan in enumerate(plans):
        for int_nco in (False, True):
            fast = seq_corrections(plan, int_nco=int_nco, want_end=True)
            ref = seq_corrections(plan, int_nco=int_nco, _ref=True)
            lazy = seq_corrections(plan, int_nco=int_nco)  # production mode
            for a, b in zip(lazy[:3], ref[:3]):
                assert np.array_equal(a, b), (i, int_nco, "want_end=False")
            for a, b in zip(fast, ref):
                assert np.array_equal(a, b), (i, int_nco)
            n_corr += len(fast[0])
    assert n_corr > 0  # the cross-check exercised real corrections


def test_carrier_chain_channel_capacity_raises():
    """Past the native slot capacity the chain must fail loudly, not
    silently return uninitialized output (gseq_carr_chain returns -1)."""
    from gpssim_tpu.ops.synth_seq import carrier_chain

    C = 65
    with pytest.raises(ValueError, match="slot capacity"):
        carrier_chain(
            np.zeros(C), np.full((3, C), 1e-4), num_samples=100,
            delt=1.0 / 3e6,
        )


def test_carrier_chain_threaded_matches_serial(monkeypatch):
    """gseq_carr_chain fans channels out over threads on multi-core
    hosts; the schedule must not change a single bit (channels are
    independent, writes disjoint).  Forced via GPSSIM_CHAIN_THREADS so
    the threaded path runs even on a single-core CI host."""
    rng = np.random.default_rng(11)
    C, K, N = 12, 40, 300_000
    carr0 = rng.uniform(0.0, 1.0, C)
    f_carr = rng.uniform(-4800.0, 4800.0, (K, C))
    f_carr[:, 3] = 0.0  # an inactive slot carries through
    delt = 1.0 / 2.6e6

    monkeypatch.setenv("GPSSIM_CHAIN_THREADS", "1")
    serial = carrier_chain(carr0, f_carr, N, delt)
    monkeypatch.setenv("GPSSIM_CHAIN_THREADS", "5")
    threaded = carrier_chain(carr0, f_carr, N, delt)
    assert np.array_equal(serial, threaded)
