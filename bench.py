#!/usr/bin/env python
"""Headline benchmark: reads/s per chip for k-mer counting + dBG build.

Workload (BASELINE.md): per segment, extract dbg_kmer-mers from all reads,
build the de Bruijn graph (edges, degrees, branch nodes), walk all contigs
(pointer-doubling traversal), and count breakage octamers — one fused jit
over a batch of segments on one chip.

Baseline: the same pipeline in single-threaded C++ (native/gadev.cpp:
hash-map dBG + rolling k-mer counter), the shape of implementation the
reference uses (lib/DeNovoAssembler.cpp).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": reads/s (TPU), "unit": "reads/s",
   "vs_baseline": tpu_reads_per_s / cpp_single_core_reads_per_s}
All diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# one-shot emitter + watchdog: the r02 driver run timed out inside an extra
# and captured NO JSON at all (BENCH_r02.json rc=124, parsed=null). The
# headline payload is registered as soon as the core measurement exists; a
# watchdog hard-exits (after printing it) when the extras budget runs out, so
# the driver always sees exactly one JSON line within bounded wall time.
_emit_lock = threading.Lock()
_emitted = False


def emit(payload: dict) -> None:
    global _emitted
    with _emit_lock:
        if not _emitted:
            print(json.dumps(payload), flush=True)
            _emitted = True


def start_watchdog(payload: dict, seconds: float) -> threading.Timer:
    def fire():
        log(f"watchdog: extras budget ({seconds:.0f}s) exhausted; emitting")
        emit(payload)
        os._exit(0)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def _device_alive(timeout_s: int | None = None, tries: int | None = None) -> bool:
    """Probe TPU compute in a subprocess (a wedged relay hangs device ops
    indefinitely; a hung bench reports nothing, a CPU fallback reports
    something). Observed fresh-client first-op latencies span ~1-15 min —
    wedges are usually transient — so probe several times before giving up
    on the chip (a CPU-fallback headline is a last resort, not a retry)."""
    import subprocess

    timeout_s = timeout_s or int(os.environ.get("GA_BENCH_PROBE_S", "300"))
    tries = tries or int(os.environ.get("GA_BENCH_PROBE_TRIES", "3"))
    # overall deadline across ALL tries: a genuinely wedged relay must not
    # burn tries*timeout (~15 min) of the driver's budget before the CPU
    # fallback starts — each retry gets only what's left of the budget
    budget_s = float(os.environ.get("GA_BENCH_PROBE_BUDGET_S", "420"))
    deadline = time.monotonic() + budget_s
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jnp.arange(8.0).sum()))")
    for i in range(tries):
        left = deadline - time.monotonic()
        if left <= 5:
            log(f"device probe: budget {budget_s}s exhausted after {i} tries")
            return False
        try:
            r = subprocess.run(["python", "-c", code],
                               timeout=min(timeout_s, left),
                               capture_output=True)
            if r.returncode == 0:
                return True
            log(f"device probe {i}: rc={r.returncode}")
        except subprocess.TimeoutExpired:
            log(f"device probe {i}: no response")
    return False


def main():
    import jax

    degraded = None
    if not _device_alive():
        log("WARNING: TPU compute probe hung; falling back to CPU "
            "(results NOT representative of TPU performance)")
        degraded = "cpu-fallback: TPU probe unresponsive"
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp

    from genomeassembler_dev_tpu.core.encoding import encode_dna
    from genomeassembler_dev_tpu.core.querytable import load_default_query_table
    from genomeassembler_dev_tpu.dbg.dense import contigs_dense
    from genomeassembler_dev_tpu.merge import native
    from genomeassembler_dev_tpu.ops.mxu import count_kmers_mxu
    from genomeassembler_dev_tpu.ops.windows import kmer_window_codes
    from genomeassembler_dev_tpu.sim.reads import n_draws_for, simulate_reads
    from genomeassembler_dev_tpu.sim.segments import synthetic_genome

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev}")

    # B=1024 is the measured throughput knee (tools/prof sweep, r4): the
    # tunneled backend costs ~2.5 ms of dispatch per call, so per-read cost
    # keeps falling until device compute dominates (256: 105M, 512: 125M,
    # 1024: 138M, 2048: 129M reads/s). A B=256 group is timed alongside as
    # an extra so the ms/batch history (62.8 -> ... -> 19.1 -> r4) stays
    # comparable across rounds.
    B = 1024 if degraded is None else 256  # degraded CPU run: stay small
    # so the fallback still emits JSON within the driver's budget
    SEQ_LEN, READ_LEN, COV, DBG_K = 1000, 12, 40.0, 9
    MAX_WALKS, MAX_LEN = 256, SEQ_LEN + DBG_K
    N_DRAWS = n_draws_for(COV, SEQ_LEN, READ_LEN)

    table = load_default_query_table()
    probs8 = jnp.asarray(table.probs[8], jnp.float32)

    # --- inputs: simulated read sets for B segments (one batched jit) -------
    log("simulating reads...")
    genomes = jnp.asarray(
        np.stack([encode_dna(synthetic_genome(i, SEQ_LEN)) for i in range(B)])
    )
    keys = jax.random.split(jax.random.key(0), B)
    sim = jax.jit(
        jax.vmap(lambda k, g: simulate_reads(k, g, probs8, READ_LEN, N_DRAWS))
    )
    rs = sim(keys, genomes)
    read_codes = rs.codes  # [B, N, R]
    read_valid = rs.valid  # [B, N]
    jax.block_until_ready(read_codes)
    n_reads_total = int(np.asarray(read_valid).sum())
    log(f"{n_reads_total} reads total ({B} segments x ~{n_reads_total // B})")

    # --- TPU step: read dedup + fused dense dBG + walk + octamer count ------
    # dedup-with-counts first (the reference's own scoring-side move,
    # cpp:333-337): distinct reads <= seq_len - read_len + 1 = 989, so every
    # downstream histogram shrinks ~3.5x; octamer counts are multiplicity-
    # weighted and therefore identical to counting every read.
    U_CAP = 1024
    from genomeassembler_dev_tpu.ops.dedup import (
        dedup_with_counts, pack_read_codes, unpack_kmer_windows)
    from genomeassembler_dev_tpu.ops.mxu import bincount_mxu

    def per_segment(codes, valid):
        packed = pack_read_codes(codes, valid)
        ucodes, ucounts, n_u = dedup_with_counts(packed, U_CAP)
        uvalid = jnp.arange(U_CAP, dtype=jnp.int32) < n_u
        kc = unpack_kmer_windows(ucodes, READ_LEN, DBG_K)
        kv = jnp.broadcast_to(uvalid[:, None], kc.shape)
        buf, lens, wvalid, overflow, n_walks, n_nodes = contigs_dense(
            kc, kv, DBG_K, MAX_LEN, MAX_WALKS
        )
        oc = unpack_kmer_windows(ucodes, READ_LEN, 8)
        counts8 = bincount_mxu(
            oc.reshape(-1),
            jnp.broadcast_to(uvalid[:, None], oc.shape).reshape(-1),
            4**8,
            jnp.broadcast_to(ucounts[:, None], oc.shape).reshape(-1),
            weight_bits=16,  # multiplicities <= reads/segment < 2^16
        )
        return (
            jnp.where(wvalid, lens, 0).sum(),
            n_walks,
            counts8.sum(),
            n_u,
        )

    step = jax.jit(jax.vmap(per_segment))

    log("compiling...")
    out = step(read_codes, read_valid)
    jax.block_until_ready(out)
    log(f"sanity: walks/segment ~{int(np.asarray(out[1]).mean())}, "
        f"contig chars/segment ~{int(np.asarray(out[0]).mean())}, "
        f"distinct reads/segment ~{int(np.asarray(out[3]).mean())}")
    assert (np.asarray(out[1]) <= MAX_WALKS).all(), "walk capacity exceeded"
    assert (np.asarray(out[3]) <= U_CAP).all(), "read dedup capacity exceeded"
    assert int(np.asarray(out[2]).sum()) == int(
        (np.asarray(read_valid).sum(1) * (READ_LEN - 8 + 1)).sum()
    ), "weighted octamer count != total windows"

    # correctness spot check: segment 0 contigs must match the native engine
    from genomeassembler_dev_tpu.dbg.assemble import contigs_from_read_codes

    codes0 = np.asarray(read_codes[0])
    valid0 = np.asarray(read_valid[0])
    if native.available():
        tpu_contigs = contigs_from_read_codes(codes0, valid0, DBG_K, MAX_LEN)
        reads0 = ["".join("ACGT"[c] for c in row)
                  for row, ok in zip(codes0, valid0) if ok]
        cpp_contigs = native.contigs_from_reads_native(reads0, DBG_K)
        assert tpu_contigs == cpp_contigs, "TPU contigs != native contigs"
        log(f"correctness: {len(tpu_contigs)} contigs match native engine")

    # NB: on the tunneled backend block_until_ready can return before the
    # device finishes — a host fetch of one output element is the only
    # reliable sync, and dispatch overhead (~1 ms RTT) is amortized over REPS
    REPS = 10

    def time_tpu_group() -> float:
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = step(read_codes, read_valid)
        _ = np.asarray(out[0][0])
        return (time.perf_counter() - t0) / REPS

    def time_cpp_pass(reads_by_seg) -> float:
        t0 = time.perf_counter()
        for reads in reads_by_seg:
            native.count_kmers_native(reads, 8)
            native.contigs_from_reads_native(reads, DBG_K)
        return time.perf_counter() - t0

    # --- interleaved TPU / single-core-C++ measurement ----------------------
    # The C++ denominator swings ~1.7x with host load (262-455 ms observed
    # across rounds); an un-interleaved best-of-N C++ vs min-of-M TPU made
    # the archived ratio hostage to whichever load regime the C++ reps hit.
    # Interleave the two sides in pairs sampled under the SAME load and take
    # the median of per-pair ratios; absolute ms for both sides are reported
    # alongside so rounds stay comparable on the stable (TPU-ms) axis.
    vs_baseline = float("nan")
    tpu_times, cpp_times, pair_ratios = [], [], []
    if native.available():
        codes_np = np.asarray(read_codes)
        valid_np = np.asarray(read_valid)
        reads_by_seg = [
            ["".join("ACGT"[c] for c in row) for row, ok in zip(cs, vs) if ok]
            for cs, vs in zip(codes_np, valid_np)
        ]
        time_tpu_group()  # untimed warm group: the first group after compile
        # runs 2-4x slow on the tunneled backend (r4 run 1: pair-0 ratio 3.6
        # vs 16-17 for pairs 1-4) and would waste one pair on warmup
        for i in range(5):
            t_c = time_cpp_pass(reads_by_seg)
            t_t = time_tpu_group()
            cpp_times.append(t_c)
            tpu_times.append(t_t)
            pair_ratios.append(t_c / t_t)
            log(f"pair {i}: cpp {t_c * 1e3:.1f} ms, tpu {t_t * 1e3:.2f} ms "
                f"-> ratio {t_c / t_t:.1f}x")
        vs_baseline = float(np.median(pair_ratios))
    else:
        log("native engine unavailable; vs_baseline = NaN")
        for _ in range(3):
            tpu_times.append(time_tpu_group())

    t_tpu = min(tpu_times)
    tpu_rps = n_reads_total / t_tpu
    log(f"tpu: {t_tpu * 1e3:.2f} ms/batch -> {tpu_rps:,.0f} reads/s")
    extras = {
        "tpu_ms_per_batch": round(t_tpu * 1e3, 2),
    }
    if degraded:
        extras["degraded"] = degraded
    if cpp_times:
        extras["cpp_ms_best"] = round(min(cpp_times) * 1e3, 1)
        extras["cpp_ms_range"] = [round(min(cpp_times) * 1e3, 1),
                                  round(max(cpp_times) * 1e3, 1)]
        extras["ratio_pairs"] = [round(r, 1) for r in pair_ratios]
        log(f"median interleaved ratio: {vs_baseline:.1f}x "
            f"(pairs {extras['ratio_pairs']})")
    payload = {
        "metric": "reads_per_sec_kmer_count_plus_dbg_build",
        "value": round(tpu_rps, 1),
        "unit": "reads/s",
        # a degraded (CPU-fallback) run's ratio is CPU-JAX vs C++, not the
        # TPU claim — publish null so drivers never archive it as a TPU
        # number; the raw pair ratios stay in extras for diagnosis
        "vs_baseline": (round(vs_baseline, 3)
                        if vs_baseline == vs_baseline and not degraded
                        else None),
        "extras": extras,  # extras mutate in place as they complete
    }
    # 240 s proved too tight when the relay is in a slow-compile regime (the
    # r4 repo-side run's watchdog fired mid-way through the e2e cold pass,
    # dropping the cold/warm extras); the headline is already emitted-on-
    # deadline, so a longer extras window risks nothing but its own time.
    extras_budget = float(os.environ.get("GA_BENCH_EXTRAS_S", "420"))
    t_extras0 = time.perf_counter()
    remaining = lambda: extras_budget - (time.perf_counter() - t_extras0)
    watchdog = start_watchdog(payload, extras_budget)

    # --- extra: end-to-end experiments/s (simulate -> dBG -> 10k-ordering
    # merge -> double scoring -> KS -> Levenshtein), batched runner. Runs
    # FIRST: it is the round-1 ask that has never been driver-captured ------
    try:
        from genomeassembler_dev_tpu.pipeline.batch_runner import (
            run_experiments_batched)
        from genomeassembler_dev_tpu.pipeline.config import ExperimentConfig
        from genomeassembler_dev_tpu.sim.segments import synthetic_genome as sg

        cfg = ExperimentConfig(seq_len=1000, read_len=12, dbg_kmer=9,
                               coverage_target=40.0, kmer=8, seed=1234,
                               n_orderings=10000)
        segs = [sg(1000 + i, 1000) for i in range(32)]
        tbl = load_default_query_table()
        t0 = time.perf_counter()
        res = run_experiments_batched(cfg, segs, tbl)  # compile + run
        t_cold = time.perf_counter() - t0
        assert len(res) == len(segs) and all(r.n_solutions >= 1 for r in res)
        extras["experiments_per_sec_e2e_cold"] = round(len(segs) / t_cold, 3)
        log(f"e2e batched study (cold): {len(segs)} experiments in "
            f"{t_cold:.1f} s -> {len(segs) / t_cold:.2f} experiments/s")
        if remaining() > 1.5 * t_cold / 4:  # warm pass reuses every compile
            t0 = time.perf_counter()
            res = run_experiments_batched(cfg, segs, tbl)
            t_e2e = time.perf_counter() - t0
            extras["experiments_per_sec_e2e"] = round(len(segs) / t_e2e, 3)
            log(f"e2e batched study: {len(segs)} experiments in {t_e2e:.1f} s"
                f" -> {len(segs) / t_e2e:.2f} experiments/s (warm)")
    except Exception as e:
        log(f"e2e experiments/s extra skipped: {e}")

    # --- extra: B=256 batch timing (cross-round ms/batch history) -----------
    try:
        if remaining() < 60:
            raise TimeoutError("extras budget low; skipping B=256 group")
        codes256, valid256 = read_codes[:256], read_valid[:256]
        out = step(codes256, valid256)  # separate compile (new shape)
        jax.block_until_ready(out)
        times256 = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = step(codes256, valid256)
            _ = np.asarray(out[0][0])
            times256.append((time.perf_counter() - t0) / REPS)
        extras["tpu_ms_per_batch_b256"] = round(min(times256) * 1e3, 2)
        log(f"B=256 group: {min(times256) * 1e3:.2f} ms/batch "
            f"(history axis; headline batch is B={B})")
    except Exception as e:
        log(f"B=256 extra skipped: {e}")

    # --- extra: roofline / MFU accounting for the fused headline step -------
    # "is it fast" relative to the CHIP, not just to single-core C++. FLOP
    # and byte counts come from XLA's own cost model for the compiled step
    # (auditable via jax .compile().cost_analysis()); peaks are the public
    # TPU v5e numbers: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
    V5E_PEAK_FLOPS = 197e12
    V5E_PEAK_HBM = 819e9
    try:
        ca = step.lower(read_codes, read_valid).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fl = float(ca.get("flops", 0.0))
        by = float(ca.get("bytes accessed", 0.0))
        if fl > 0 and t_tpu > 0:
            extras["fused_step_tflops_per_sec"] = round(fl / t_tpu / 1e12, 2)
            extras["fused_step_pct_of_peak_mxu"] = round(
                100.0 * fl / t_tpu / V5E_PEAK_FLOPS, 2)
            log(f"roofline: fused step {fl / t_tpu / 1e12:.2f} TFLOP/s = "
                f"{100.0 * fl / t_tpu / V5E_PEAK_FLOPS:.1f}% of v5e MXU peak "
                f"(XLA-counted {fl / 1e9:.1f} GFLOP/batch)")
        if by > 0 and t_tpu > 0:
            extras["fused_step_hbm_gb_per_sec"] = round(by / t_tpu / 1e9, 1)
            extras["fused_step_pct_of_hbm_peak"] = round(
                100.0 * by / t_tpu / V5E_PEAK_HBM, 2)
            log(f"roofline: fused step {by / t_tpu / 1e9:.1f} GB/s = "
                f"{100.0 * by / t_tpu / V5E_PEAK_HBM:.1f}% of v5e HBM peak "
                f"(XLA-counted {by / 1e6:.1f} MB/batch)")
    except Exception as e:
        log(f"roofline extra skipped: {e}")

    # --- extra: edit-distance throughput ------------------------------------
    try:
        if remaining() < 45:
            raise TimeoutError("extras budget low; skipping edit-distance")
        from genomeassembler_dev_tpu.ops.edit_distance import batched_levenshtein_auto

        S, M = 256, 1024
        rng = np.random.default_rng(1)
        qs = jnp.asarray(rng.integers(0, 4, (S, M)).astype(np.uint8))
        qlen = jnp.full(S, M, jnp.int32)
        tgt = jnp.asarray(rng.integers(0, 4, SEQ_LEN).astype(np.uint8))
        _ = np.asarray(batched_levenshtein_auto(qs, qlen, tgt)[0])
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = batched_levenshtein_auto(qs, qlen, tgt)
        _ = np.asarray(out[0])
        t_lev = (time.perf_counter() - t0) / REPS
        extras["lev_nw_gcells_per_sec_256x1024x1000"] = round(
            S * M * SEQ_LEN / t_lev / 1e9, 1)
        log(f"edit distance: {S}x{M}x{SEQ_LEN} in {t_lev * 1e3:.1f} ms -> "
            f"{S * M * SEQ_LEN / t_lev / 1e9:.1f} Gcell/s "
            f"({S / t_lev:,.0f} alignments/s)")

        # flagship HW-mode Myers shape (velvet-scale target length). Full
        # 2048-query batch costs minutes; bench uses 256 queries (one rep)
        # and GA_BENCH_FULL=1 unlocks the full 2048x2048x50000 shape.
        if remaining() < 60:
            raise TimeoutError("extras budget low; skipping HW edit-distance")
        S2 = 2048 if os.environ.get("GA_BENCH_FULL") else 256
        M2, T2 = 2048, 50000
        qs2 = jnp.asarray(rng.integers(0, 4, (S2, M2)).astype(np.uint8))
        qlen2 = jnp.full(S2, M2, jnp.int32)
        tgt2 = jnp.asarray(rng.integers(0, 4, T2).astype(np.uint8))
        _ = np.asarray(batched_levenshtein_auto(qs2, qlen2, tgt2,
                                                mode="HW")[0])
        t0 = time.perf_counter()
        out = batched_levenshtein_auto(qs2, qlen2, tgt2, mode="HW")
        _ = np.asarray(out[0])
        t_hw = time.perf_counter() - t0
        extras[f"lev_hw_gcells_per_sec_{S2}x{M2}x{T2}"] = round(
            S2 * M2 * T2 / t_hw / 1e9, 1)
        extras[f"lev_hw_alignments_per_sec_{S2}x{M2}x{T2}"] = round(S2 / t_hw, 1)
        # VPU roofline for the Myers bit-vector kernel: each 32-cell word
        # update costs ~14 int32 VPU ops (Eq lookup + Xv/Ph/Mh/Pv/Mv + two
        # carry chains); modelled v5e VPU throughput ~4 SIMD units x (8x128)
        # lanes x ~0.94 GHz ~ 3.9e12 int ops/s -> speed-of-light ~8.9e12
        # cell updates/s. The model is stated here so the pct is auditable.
        MYERS_CELL_BOUND = 3.9e12 * 32.0 / 14.0
        cells_per_s = S2 * M2 * T2 / t_hw
        extras["lev_hw_pct_of_vpu_bound"] = round(
            100.0 * cells_per_s / MYERS_CELL_BOUND, 2)
        log(f"edit distance HW: {S2}x{M2}x{T2} in {t_hw:.2f} s -> "
            f"{S2 * M2 * T2 / t_hw / 1e9:.1f} Gcell/s "
            f"({100.0 * cells_per_s / MYERS_CELL_BOUND:.1f}% of modelled "
            f"VPU bound)")
    except Exception as e:  # extras must not break the bench
        log(f"edit-distance extras skipped: {e}")

    watchdog.cancel()
    emit(payload)


if __name__ == "__main__":
    main()
