"""Pallas QC-LDPC kernel (ops/ldpc_pallas.py), interpret mode on CPU.

The numpy int-arithmetic golden model here is the design study for the
kernel's numeric recipe: int8 posteriors in the delta-update tile form
REQUIRE bounded message magnitudes (MSG_CLIP) — with full-range
messages the saturating posterior clip is inconsistent with the stored
messages and the decode hits an error floor. The kernel must stay
bit-exact with this model.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dvbs_tpu.spec import ldpc_spec
from dvbs_tpu.ops import ldpc_pallas
from dvbs_tpu.ops.ldpc_qc import qc_tables, to_qc_layout, from_qc_layout


def int_golden(llr_i8, table, n_iters, beta=1, msg_clip=ldpc_pallas.MSG_CLIP,
               post_clip=127):
    """Exact int model of the kernel's layered SCMS-OMS sweep."""
    t = qc_tables(table)
    G, q = t["G"], t["q"]
    post = to_qc_layout(llr_i8.astype(np.int32), table)
    msgs = {}
    mask0 = np.zeros((360, 1), bool)
    mask0[0] = True
    for _ in range(n_iters):
        for r in range(q):
            entries = list(t["layers"][r]) + [("p", 0), ("pp", 0)]
            vals, keys = [], []
            for e, ent in enumerate(entries):
                if ent[0] == "p":
                    tile = post[G + r]
                elif ent[0] == "pp":
                    tile = np.roll(post[G + q - 1], 1, axis=0) if r == 0 \
                        else post[G + r - 1]
                else:
                    tile = np.roll(post[ent[0]], ent[1], axis=0)
                old = msgs.get((r, e), np.zeros_like(tile))
                vals.append(tile - old)
                keys.append(((r, e), ent, old))
            D = len(vals)
            a = np.abs(np.stack(vals))
            neg = np.stack(vals) < 0
            if r == 0:
                a[D - 1] = np.where(mask0, 10**6, a[D - 1])
                neg[D - 1] = np.where(mask0, False, neg[D - 1])
            am = np.argmin(a, axis=0)
            m1 = np.min(a, axis=0)
            a2 = a.copy()
            np.put_along_axis(a2, am[None], 10**6, 0)
            m2 = np.min(a2, axis=0)
            par = neg.sum(axis=0) % 2
            for e, (key, ent, old) in enumerate(keys):
                excl = np.where(am == e, m2, m1)
                mag = np.clip(excl - beta, 0, msg_clip)
                news = np.where(par ^ neg[e], -1, 1) * mag
                if r == 0 and e == D - 1:
                    news = np.where(mask0, 0, news)
                flip = (old != 0) & (np.sign(old) != np.sign(news)) & \
                    (news != 0)
                news = np.where(flip, 0, news)
                delta = news - old
                msgs[key] = news

                def upd(tile, d):
                    return np.clip(tile + d, -post_clip, post_clip)
                if ent[0] == "p":
                    post[G + r] = upd(post[G + r], delta)
                elif ent[0] == "pp":
                    if r == 0:
                        post[G + q - 1] = upd(post[G + q - 1],
                                              np.roll(delta, -1, 0))
                    else:
                        post[G + r - 1] = upd(post[G + r - 1], delta)
                else:
                    post[ent[0]] = upd(post[ent[0]],
                                       np.roll(delta, -ent[1], 0))
    return (from_qc_layout(post, table) < 0).astype(np.uint8)


@pytest.fixture(scope="module")
def noisy_case():
    code = ldpc_spec.get_code("C4")
    rng = np.random.default_rng(0)
    m = rng.integers(0, 2, (ldpc_pallas.B, code.K)).astype(np.uint8)
    cw = code.encode(m)
    x = 1.0 - 2.0 * cw.astype(np.float32)
    sigma = np.sqrt(10 ** (-3.0 / 10))
    y = x + rng.normal(0, sigma, x.shape).astype(np.float32)
    llr = np.asarray(ldpc_pallas.quantize_llrs(
        jnp.asarray(2.0 * y / sigma ** 2)))
    return llr, cw


def test_kernel_matches_int_golden(noisy_case):
    llr, cw = noisy_case
    for it in (1, 3):
        # fixed sweep count for bit-exact comparison with the golden
        hard, _, _ = ldpc_pallas.decode_qc_pallas(
            jnp.asarray(llr), "C4", n_iters=it, interpret=True,
            early_exit=False)
        hg = int_golden(llr, "C4", n_iters=it)
        np.testing.assert_array_equal(np.asarray(hard), hg)


@pytest.mark.parametrize("table", ["B4", "C1", "B11"])
def test_kernel_matches_int_golden_other_tables(table):
    """Bit-exactness across table families: the bench's normal-frame
    B4, the lowest-rate short C1, and the highest-rate normal B11 (most
    layers). One sweep over random LLRs is enough — golden parity tests
    the arithmetic, not convergence."""
    t = qc_tables(table)
    rng = np.random.default_rng(1)
    llr = rng.integers(-25, 26, (ldpc_pallas.B, t["N"])).astype(np.int8)
    hard, _, _ = ldpc_pallas.decode_qc_pallas(
        jnp.asarray(llr), table, n_iters=1, interpret=True,
        early_exit=False)
    hg = int_golden(llr, table, n_iters=1)
    np.testing.assert_array_equal(np.asarray(hard), hg)


def test_kernel_converges_at_3db(noisy_case):
    llr, cw = noisy_case
    hard, bad, trials = ldpc_pallas.decode_qc_pallas(
        jnp.asarray(llr), "C4", n_iters=12, interpret=True)
    assert (np.asarray(hard) == cw).all()
    assert (np.asarray(bad) == 0).all()
    trials = np.asarray(trials)
    # real per-frame convergence counts: all converge well before the
    # budget at 3 dB, and the early exit must not cost correctness
    assert (trials >= 1).all() and (trials < 12).all()


def test_kernel_early_exit_matches_full_run(noisy_case):
    """Early exit stops once the online syndrome is clean batch-wide;
    the hard output must match the fixed-sweep run's FEC result (both
    fully converged)."""
    llr, cw = noisy_case
    h_ee, bad_ee, tr = ldpc_pallas.decode_qc_pallas(
        jnp.asarray(llr), "C4", n_iters=12, interpret=True)
    h_fx, bad_fx, _ = ldpc_pallas.decode_qc_pallas(
        jnp.asarray(llr), "C4", n_iters=12, interpret=True,
        early_exit=False)
    assert (np.asarray(bad_ee) == 0).all()
    assert (np.asarray(bad_fx) == 0).all()
    np.testing.assert_array_equal(np.asarray(h_ee), np.asarray(h_fx))


def test_online_syndrome_agrees_with_exact_at_operating_point(noisy_case):
    """syndrome="kernel" (the zero-cost in-sweep count the early-exit
    gate uses, and the default return) vs syndrome="xla" (exact
    recompute from the final posteriors):

    - with the budget >= convergence (the operating point: early exit
      runs until the whole batch is clean) the two are IDENTICAL;
    - under-budget, the online count may only be CONSERVATIVE — it can
      flag a frame that actually converged during the final sweep
      (its layers saw pre-update posteriors; escalation retries it),
      but must never claim a dirty frame clean."""
    llr, cw = noisy_case
    _, bk, tk = ldpc_pallas.decode_qc_pallas(
        jnp.asarray(llr), "C4", n_iters=12, interpret=True,
        syndrome="kernel")
    _, bx, tx = ldpc_pallas.decode_qc_pallas(
        jnp.asarray(llr), "C4", n_iters=12, interpret=True,
        syndrome="xla")
    np.testing.assert_array_equal(np.asarray(bk), np.asarray(bx))
    assert (np.asarray(bk) == 0).all()
    np.testing.assert_array_equal(np.asarray(tk), np.asarray(tx))
    # under-budget (4 of the ~6 sweeps this batch needs)
    _, bk4, _ = ldpc_pallas.decode_qc_pallas(
        jnp.asarray(llr), "C4", n_iters=4, interpret=True,
        syndrome="kernel")
    _, bx4, _ = ldpc_pallas.decode_qc_pallas(
        jnp.asarray(llr), "C4", n_iters=4, interpret=True,
        syndrome="xla")
    ok_k = np.asarray(bk4) == 0
    ok_x = np.asarray(bx4) == 0
    assert not (ok_k & ~ok_x).any(), "online count claimed a dirty frame clean"


def test_full_range_messages_hit_error_floor(noisy_case):
    """The design constraint itself: msg_clip=127 must FAIL where
    MSG_CLIP succeeds (documents why the cap exists)."""
    llr, cw = noisy_case
    h127 = int_golden(llr[:, :], "C4", n_iters=12, msg_clip=127)
    errs = (h127 != cw).sum()
    assert errs > 0, "full-range messages unexpectedly converged"


def test_cyclic_lane_padding_trials_parity(noisy_case):
    """Cyclic lane padding (small blocks repeated to fill the 128
    lanes, models/dvbs2.py fec="pallas") must behave exactly like the
    originals: each padded copy converges at ITS original's sweep count
    and decodes to the same bits, so the early-exit gate and trial
    metrics see no phantom work. (On chip the padded decode measured
    FASTER than 128 distinct frames — lanes are 128 wide regardless;
    PROFILE_r4.md "Variable-batch".)"""
    llr, cw = noisy_case
    F = 2
    small = llr[:F]
    padded = np.tile(small, (ldpc_pallas.B // F, 1))
    h, nb, tr = ldpc_pallas.decode_qc_pallas(
        jnp.asarray(padded), "C4", n_iters=8, interpret=True)
    h, nb, tr = np.asarray(h), np.asarray(nb), np.asarray(tr)
    for lane in range(ldpc_pallas.B):
        src = lane % F
        assert np.array_equal(h[lane], h[src]), lane
        assert tr[lane] == tr[src] and nb[lane] == nb[src]
    assert np.array_equal(h[:F], cw[:F])
    assert (nb[:F] == 0).all()


def test_roll_and_stash_variants_bit_exact(noisy_case):
    """The prim-roll (pltpu.roll) and int8 sign-stash kernel variants
    are pure lowering changes: every (roll_impl, stash8) combo must
    produce the identical hard bits / syndromes / trials."""
    llr, _ = noisy_case
    ref = None
    for roll in ("buffer", "prim"):
        for s8 in (False, True):
            out = ldpc_pallas.decode_qc_pallas(
                jnp.asarray(llr), "C4", n_iters=3, interpret=True,
                early_exit=False, roll_impl=roll, stash8=s8)
            out = [np.asarray(o) for o in out]
            if ref is None:
                ref = out
                continue
            for a, b in zip(out, ref):
                np.testing.assert_array_equal(a, b)


def test_oriented_schedule_bit_exact(noisy_case):
    """Oriented posterior storage (pass-2 write-back without the inverse
    roll; shift composition baked into the static tables,
    kernel_tables_oriented) must be bit-identical to the natural
    schedule — hard bits, syndromes, and trials — under both fixed and
    early-exit sweep loops."""
    llr, _ = noisy_case
    for ee in (False, True):
        ref = ldpc_pallas.decode_qc_pallas(
            jnp.asarray(llr), "C4", n_iters=3, interpret=True,
            early_exit=ee, schedule="natural")
        got = ldpc_pallas.decode_qc_pallas(
            jnp.asarray(llr), "C4", n_iters=3, interpret=True,
            early_exit=ee, schedule="oriented")
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_oriented_tables_consistency():
    """Table-build invariants across every DVB-S2 code: the steady
    orientation is the schedule fixed point, dup entries sit in the
    static roll region, and slot counts cover every entry."""
    from dvbs_tpu.ops.ldpc_qc import qc_tables
    for table in ("B1", "B4", "B11", "C1", "C5", "C9", "C10"):
        kt = ldpc_pallas.kernel_tables_oriented(table)
        t = qc_tables(table)
        q, D2, rz = kt["q"], kt["Dmax"], kt["rz"]
        f = kt["f_tab"]
        for r in range(q):
            n_valid = int((f[r] & ldpc_pallas.F_VALID).sum())
            assert n_valid == len(t["layers"][r]) + 2
