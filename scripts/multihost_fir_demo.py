#!/usr/bin/env python
"""Local multi-host (fake-DCN) demo + fault-injection restart test.

Orchestrator mode (no JAX_PROCESS_ID in env):
    python scripts/multihost_fir_demo.py --procs 2 --devices-per-proc 4
    python scripts/multihost_fir_demo.py --procs 2 --inject-fault 1

Spawns N worker processes on localhost (CPU devices standing in for DCN-
connected hosts — SURVEY.md §4.5), forming one global (channel, time)
mesh.  Workers stream a sharded FIR chain super-block by super-block,
checkpointing state each block.  With ``--inject-fault k``, worker 1
kills itself at block k; the orchestrator observes the failed job,
relaunches it with ``--resume``, and asserts the final output equals an
uninterrupted run (restart-from-checkpoint recovery, SURVEY.md §5).

Worker mode is selected by the JAX_PROCESS_ID env var.
"""

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def orchestrate(args):
    port = 12655
    workdir = args.workdir or tempfile.mkdtemp(prefix="mh_demo_")
    os.makedirs(workdir, exist_ok=True)

    def launch(resume: bool):
        procs = []
        for pid in range(args.procs):
            env = dict(os.environ)
            env.update(
                JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                JAX_NUM_PROCESSES=str(args.procs),
                JAX_PROCESS_ID=str(pid),
                XLA_FLAGS=(
                    f"--xla_force_host_platform_device_count="
                    f"{args.devices_per_proc}"
                ),
                PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
            )
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--workdir", workdir,
                   "--procs", str(args.procs),
                   "--devices-per-proc", str(args.devices_per_proc)]
            if args.inject_fault is not None and not resume:
                cmd += ["--inject-fault", str(args.inject_fault)]
            if resume:
                cmd += ["--resume"]
            procs.append(subprocess.Popen(cmd, env=env))
        return [p.wait() for p in procs]

    codes = launch(resume=False)
    if args.inject_fault is not None:
        if not any(c != 0 for c in codes):
            print("FAULT INJECTION FAILED TO FIRE", file=sys.stderr)
            sys.exit(1)
        print("[orchestrator] fault observed, relaunching with --resume",
              file=sys.stderr)
        codes = launch(resume=True)
    if any(c != 0 for c in codes):
        print(f"workers failed: {codes}", file=sys.stderr)
        sys.exit(1)
    # verify against single-process golden
    out = np.load(os.path.join(workdir, "out.npy"))
    ref = np.load(os.path.join(workdir, "ref.npy"))
    ok = np.array_equal(out, ref)
    print(f"[orchestrator] multihost == streaming-golden: {ok}")
    sys.exit(0 if ok else 1)


def worker(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from llzlab_tpu.runtime.distributed import (
        global_dsp_mesh, init_distributed,
    )

    init_distributed()
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import llzlab_tpu as lz
    from llzlab_tpu.parallel.mesh import CHANNEL_AXIS, TIME_AXIS
    from llzlab_tpu.parallel import sharded_ops as so
    from llzlab_tpu.utils.checkpoint import load_state, save_state

    mesh = global_dsp_mesh()  # (1, procs*devices) — time spans everything
    nt = mesh.shape[TIME_AXIS]
    taps = lz.firwin(512, 0.3)
    t_loc = 3072  # multiple of the 512-tap OLS hop
    c, blk = 4, t_loc * nt
    n_blocks = 4
    rng = np.random.default_rng(7)
    x_all = rng.standard_normal((c, blk * n_blocks)).astype(np.float32)

    ck = os.path.join(args.workdir, "state.npz")
    sharding = NamedSharding(mesh, P(CHANNEL_AXIS, TIME_AXIS))
    state = jnp.zeros((c, 2048), jnp.float32)  # fir_state_len(512)=2048-? no:
    from llzlab_tpu.ops.fir import fir_state_len

    state = jnp.zeros((c, fir_state_len(512)), jnp.float32)
    start = 0
    if args.resume and os.path.exists(ck):
        (state,), start, _ = load_state(ck, like=(state,))
        if jax.process_index() == 0:
            print(f"[worker0] resumed at block {start}", file=sys.stderr)

    outs = []
    for bi in range(n_blocks):
        xg = jax.make_array_from_callback(
            (c, blk), sharding,
            lambda idx, bi=bi: x_all[:, bi * blk : (bi + 1) * blk][idx],
        )
        if bi < start:
            continue
        if (
            args.inject_fault is not None
            and bi == args.inject_fault
            and jax.process_index() == 1
            and not args.resume
        ):
            print("[worker1] injected fault — dying", file=sys.stderr)
            os._exit(17)
        y, state = so.fir_filter_sharded(
            xg, taps, mesh, state=state, return_state=True
        )
        outs.append(
            np.asarray(jax.device_get(
                jax.jit(lambda v: v, out_shardings=NamedSharding(
                    mesh, P(None, None)))(y)
            ))
        )
        if jax.process_index() == 0:
            save_state(ck, (state,), block_index=bi + 1)

    # ---- r5: spectral-gain chain over the SAME process-spanning mesh ----
    # (config 4's sharded path: the analysis-lookahead and OLA-tail
    # ppermutes ride the fake DCN between the two processes.)  Every
    # process executes the collective program; proc 0 checks vs the
    # unsharded one-shot chain.
    from llzlab_tpu.parallel.spectral_sp import spectral_gain_sharded

    gain = np.linspace(1.0, 0.25, 1025).astype(np.float32)
    xs_g = jax.make_array_from_callback(
        (c, blk), sharding, lambda idx: x_all[:, :blk][idx])
    y_sp = spectral_gain_sharded(xs_g, gain, mesh)
    y_sp_full = np.asarray(jax.device_get(
        jax.jit(lambda v: v, out_shardings=NamedSharding(
            mesh, P(None, None)))(y_sp)))
    if jax.process_index() == 0:
        spec = lz.stft(x_all[:, :blk], n_fft=2048, hop=512)
        y_ref = np.asarray(lz.istft(spec * gain, n_fft=2048, hop=512,
                                    length=blk))
        cut = blk - 2048  # final frames see the last shard's zero pad
        err = y_ref[:, :cut] - y_sp_full[:, :cut]
        snr_sp = 10 * np.log10(
            np.sum(y_ref[:, :cut] ** 2) / max(np.sum(err ** 2), 1e-300))
        print(f"spectral sharded == unsharded: {snr_sp >= 80.0} "
              f"({snr_sp:.1f} dB)", file=sys.stderr)

    if jax.process_index() == 0:
        # Stitch with any blocks completed before resume (recompute them
        # from the checkpointed prefix = rerun blocks < start determin.)
        if start:
            zi, parts = None, []
            for bi in range(start):
                yb, zi = lz.fir_filter(
                    x_all[:, bi * blk : (bi + 1) * blk].reshape(c, blk),
                    taps, method="ols", zi=zi, return_zf=True,
                )
                # reshape to sharded-equivalent streaming at t_loc grain
                parts.append(np.asarray(yb))
            prefix = np.concatenate(parts, -1)
        else:
            prefix = np.zeros((c, 0), np.float32)
        out = np.concatenate([prefix] + outs, axis=-1)
        np.save(os.path.join(args.workdir, "out.npy"), out)
        # golden: unsharded streaming at t_loc granularity
        zi, parts = None, []
        for j in range(n_blocks * nt):
            yb, zi = lz.fir_filter(
                x_all[:, j * t_loc : (j + 1) * t_loc], taps, method="ols",
                zi=zi, return_zf=True,
            )
            parts.append(np.asarray(yb))
        np.save(os.path.join(args.workdir, "ref.npy"),
                np.concatenate(parts, -1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--procs", type=int, default=2)
    p.add_argument("--devices-per-proc", type=int, default=4)
    p.add_argument("--inject-fault", type=int, default=None,
                   help="block index at which worker 1 dies")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--workdir", default=None)
    args = p.parse_args()
    if os.environ.get("JAX_PROCESS_ID") is None:
        orchestrate(args)
    else:
        worker(args)


if __name__ == "__main__":
    main()
