"""Command-line trainer/predictor — the rebuild of bin/ocaml_gpr.ml.

Same flag set, same CSV-over-stdin protocol, same model pipeline: the
variational FIC flavor with the se_fat kernel (bin/ocaml_gpr.ml:176-177),
target centering and per-dimension input standardization (:249-269), L-BFGS
evidence maximization with 1 Hz throttled verbose reports and SIGINT-safe
best-model bailout (:301-349), model save/load, and test-time mean
(+ optional stddev) prediction with de-standardization (:373-413).

Deliberate deviations, documented:
  * the model file is a versioned npz (io/checkpoint.py), not Marshal;
  * the reference scales each input dimension by sqrt(sum((x - mean)^2))
    — an n-fold larger "stddev" than the usual estimator
    (bin/ocaml_gpr.ml:262 ``Vec.ssqr``); replicated here for parity.
"""

from __future__ import annotations

import argparse
import math
import signal
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gpr_tpu", description=__doc__.splitlines()[0]
    )
    p.add_argument("-cmd", choices=["train", "test"], default="train",
                   help="train (default) or test model")
    p.add_argument("-model", required=True, help="model file to use")
    p.add_argument("-with-stddev", dest="with_stddev", action="store_true",
                   help="make predictions with both mean and standard deviation")
    p.add_argument("-predictive", action="store_true",
                   help="standard deviation includes noise level (predictive)")
    p.add_argument("-max-iter", dest="max_iter", type=int, default=None,
                   help="maximum number of optimization steps (default: limitless)")
    p.add_argument("-n-inducing", dest="n_inducing", type=int, default=10,
                   help="number of randomly initialized inducing inputs (default: 10)")
    p.add_argument("-sigma2", type=float, default=1.0,
                   help="initial noise level (default: 1.0)")
    p.add_argument("-amplitude", type=float, default=1.0,
                   help="initial amplitude level (default: 1.0)")
    p.add_argument("-dim-red", dest="dim_red", type=int, default=None,
                   help="dimensionality reduction (default: none)")
    p.add_argument("-log-het-sked", dest="log_het_sked", type=float,
                   default=None,
                   help="turns on / sets log-heteroskedastic noise")
    p.add_argument("-multiscale", action="store_true",
                   help="turns on multiscale approximation")
    p.add_argument("-tol", type=float, default=0.1,
                   help="tolerance for gradient descent (default: 0.1)")
    p.add_argument("-step", type=float, default=0.1,
                   help="step size for gradient descent (default: 0.1)")
    p.add_argument("-eps", type=float, default=0.1,
                   help="epsilon for gradient descent (default: 0.1)")
    p.add_argument("-block-size", dest="block_size", type=int, default=None,
                   help="train with the streaming evidence in row blocks of "
                        "this size: memory stays O(block x m) at any n "
                        "(default: dense n x m cross-covariance)")
    p.add_argument("-trainer", choices=["host", "device", "sharded"],
                   default="host",
                   help="host (default): callback-rich host L-BFGS loop; "
                        "device: device-resident chunked L-BFGS "
                        "(optim.lbfgs_device.fit — production throughput, "
                        "mean-NLL objective so -eps applies per point); "
                        "sharded: multi-chip data-parallel training over "
                        "a device mesh (parallel.fit_sharded)")
    p.add_argument("-devices", default=None,
                   help="mesh for -trainer sharded: N (1-D data-parallel "
                        "mesh) or DxM (2-D data x model mesh — tensor "
                        "parallelism over the inducing axis, "
                        "parallel.fit_sharded_2d; M must divide "
                        "-n-inducing).  Default: all visible devices, 1-D")
    p.add_argument("-polish", type=int, default=0, metavar="N",
                   help="f64 finishing step after training: re-optimize the "
                        "hypers on a host-CPU f64 objective over N "
                        "subsampled rows (0 = off; restores the reference's "
                        "f64 convergence semantics after an f32 device run)")
    p.add_argument("-restarts", type=int, default=1,
                   help="random restarts: retrain from fresh random "
                        "inducing/projection draws (seed+r) and keep the "
                        "best final log evidence — the hyper landscape is "
                        "multi-modal (docs/MANUAL.md section 7)")
    p.add_argument("-checkpoint", default=None,
                   help="persist optimizer state to this file every "
                        "accepted iteration (enables -resume)")
    p.add_argument("-resume", action="store_true",
                   help="continue an interrupted -checkpoint run (requires "
                        "the same data and flags; reproduces the "
                        "uninterrupted trajectory)")
    p.add_argument("-verbose", action="store_true",
                   help="prints information while training")
    p.add_argument("-seed", type=int, default=None,
                   help="RNG seed (default: nondeterministic, like the "
                        "reference's Random.self_init)")
    return p


def read_samples(stream) -> np.ndarray:
    # Native fast path: hand the whole input to the C++ parser
    # (gpr_tpu/io/native.py); falls back to the line-by-line Python reader
    # when no toolchain/library is available.
    try:
        from .io.native import CsvError, parse_csv_bytes

        data = stream.buffer.read() if hasattr(stream, "buffer") else None
        if data is not None:
            try:
                arr = parse_csv_bytes(data)
            except CsvError as e:
                raise SystemExit(str(e))
            if arr is not None:
                return arr
            stream = data.decode().splitlines()  # native lib unavailable
    except AttributeError:
        pass

    rows = []
    d = None
    for i, line in enumerate(stream):
        line = line.strip()
        if not line:
            continue
        try:
            vals = [float(tok) for tok in line.split(",")]
        except ValueError as e:
            raise SystemExit(f"failure '{line}' converting sample: {e}")
        if d is None:
            d = len(vals)
        elif len(vals) != d:
            raise SystemExit(
                f"incompatible dimension of sample in line {i + 1}: {line}"
            )
        rows.append(vals)
    if not rows:
        raise SystemExit("no data")
    return np.asarray(rows, dtype=np.float64)


def cmd_train(args) -> int:
    import jax
    import jax.numpy as jnp

    from .kernels import SeFat
    from .models import calc_stats
    from .optim import Bailout, train

    if args.resume and args.checkpoint is None:
        raise SystemExit("-resume requires -checkpoint FILE")
    data = read_samples(sys.stdin)
    if data.shape[1] < 2:
        raise SystemExit("training data needs at least 2 columns (x..., y)")
    inputs, targets = data[:, :-1], data[:, -1]
    n, big_dim = inputs.shape

    target_mean = float(targets.mean())
    targets = targets - target_mean
    target_variance = float(targets @ targets / n)
    if args.verbose:
        print(f"target variance: {target_variance:.5f}", file=sys.stderr)

    input_means = inputs.mean(axis=0)
    # reference parity: "stddev" = sqrt(sum of squared deviations)
    # (bin/ocaml_gpr.ml:262)
    input_stddevs = np.sqrt(((inputs - input_means) ** 2).sum(axis=0))
    input_stddevs = np.where(input_stddevs == 0.0, 1.0, input_stddevs)
    inputs = (inputs - input_means) / input_stddevs

    n_inducing = min(args.n_inducing, n)
    seed = args.seed if args.seed is not None else int(time.time_ns() % (2**31))
    if args.restarts > 1 and (args.checkpoint or args.resume):
        raise SystemExit("-restarts > 1 is incompatible with "
                         "-checkpoint/-resume (single-trajectory state)")
    if args.resume and args.trainer == "sharded":
        raise SystemExit("-resume is not supported with -trainer sharded "
                         "(device-sharded state is mesh-layout dependent)")
    if args.devices is not None and args.trainer != "sharded":
        raise SystemExit("-devices requires -trainer sharded")

    log_sf2 = 2.0 * math.log(args.amplitude)

    def build_params(rng):
        """Per-restart kernel params: the projection draw is the random
        part (reference init, bin/ocaml_gpr.ml:272-300)."""
        if args.dim_red is not None:
            d = min(big_dim, args.dim_red)
            tproj = jnp.asarray(
                rng.uniform(-1.0, 1.0, (big_dim, d)) / big_dim
            )
        else:
            d = big_dim
            tproj = None
        return SeFat.Params(
            d=d,
            log_sf2=jnp.asarray(log_sf2),
            tproj=tproj,
            log_hetero_skedasticity=(
                jnp.full((n_inducing,), args.log_het_sked)
                if args.log_het_sked is not None
                else None
            ),
            log_multiscales_m05=(
                jnp.zeros((n_inducing, d)) if args.multiscale else None
            ),
        )

    X = jnp.asarray(inputs)
    y = jnp.asarray(targets)

    got_signal = {"flag": False}

    def on_sigint(signum, frame):
        got_signal["flag"] = True

    old_handler = signal.signal(signal.SIGINT, on_sigint)

    last_report = {"eval": 0.0, "grad": 0.0}

    def stats_line(trained):
        st = calc_stats(trained)
        return (
            f"MSLL={float(st.msll):7.7f} SMSE={float(st.smse):7.7f} "
            f"MAD={float(st.mad):7.7f} MAXAD={float(st.maxad):7.7f}"
        )

    def bailout(iter):
        if got_signal["flag"]:
            raise Bailout
        if args.max_iter is not None and iter > args.max_iter:
            raise Bailout

    def report_trained_model(iter, trained):
        bailout(iter)
        if args.verbose and time.time() - last_report["eval"] > 1.0:
            last_report["eval"] = time.time()
            print(f"iter {iter:4d}: {stats_line(trained)}", file=sys.stderr,
                  flush=True)

    def report_gradient_norm(iter, norm):
        bailout(iter)
        if args.verbose and time.time() - last_report["grad"] > 1.0:
            last_report["grad"] = time.time()
            print(f"iter {iter:4d}: |gradient|={norm:.5f}", file=sys.stderr,
                  flush=True)

    if args.trainer != "host":
        trained = _train_on_device(args, X, y, n_inducing, seed,
                                   build_params, got_signal, old_handler)
        trained = _apply_polish(args, X, y, trained)
        if args.verbose:
            print(f"result: {stats_line(trained)}", file=sys.stderr)
        _write_artifact(args, trained, target_mean, input_means,
                        input_stddevs)
        return 0

    try:
        trained = None
        for r in range(max(1, args.restarts)):
            seed_r = seed + r
            cand = train(
                SeFat, X, y,
                kernel_params=build_params(np.random.default_rng(seed_r)),
                sigma2=args.sigma2,
                n_rand_inducing=n_inducing,
                variational=True,  # Variational_FIC, like the CLI
                block_size=args.block_size,
                step=args.step, tol=args.tol, epsabs=args.eps,
                max_iter=args.max_iter,
                report_trained_model=report_trained_model,
                report_gradient_norm=report_gradient_norm,
                key=jax.random.PRNGKey(seed_r),
                checkpoint_path=args.checkpoint,
                resume=args.resume,
            )
            # NaN-safe best: a diverged draw (NaN evidence) must never beat
            # a finite one — every float comparison against NaN is False
            def _key(t):
                l = float(t.l)
                return (math.isfinite(l), l if math.isfinite(l) else 0.0)

            if trained is None or _key(cand) > _key(trained):
                trained = cand
            if args.verbose and args.restarts > 1:
                print(f"restart {r}: log evidence {float(cand.l):.3f}"
                      f" (best {float(trained.l):.3f})", file=sys.stderr)
            if got_signal["flag"]:
                break  # SIGINT: keep the best model found so far
    finally:
        signal.signal(signal.SIGINT, old_handler)

    trained = _apply_polish(args, X, y, trained)
    if args.verbose:
        print(f"result: {stats_line(trained)}", file=sys.stderr)

    _write_artifact(args, trained, target_mean, input_means, input_stddevs)
    return 0


def _apply_polish(args, X, y, trained):
    """-polish N: f64 finishing step (optim.polish) after any trainer.

    Reruns the same mean-NLL objective at f64 on the host CPU from the
    trained hypers (row subsample of N bounds the cost; N >= n uses all
    rows) and rebuilds the predictor state from the polished hypers.  The
    reference never needs this — GSL BFGS2 is f64 end to end; this restores
    its convergence semantics after an f32 device run (MANUAL section 7).
    """
    if not args.polish:
        return trained
    from .kernels import SeFat
    from .models.streaming import streaming_trained
    from .optim import make_pack
    from .optim.polish import polish
    from .optim.train import TrainResult

    pack = make_pack(SeFat, trained.kernel_params, trained.inducing,
                     float(trained.model.sigma2))
    p_f, z_f, s2_f, _, rep = polish(
        SeFat, X, y, pack, pack.x0, variational=True,
        subsample=min(args.polish, X.shape[0]),
        max_iter=args.max_iter if args.max_iter is not None else 40,
        epsabs=args.eps / max(1, min(args.polish, X.shape[0])),
    )
    if args.verbose:
        print(f"polish (f64, {rep.n_rows} rows): mean-NLL {rep.f0:.6f} -> "
              f"{rep.f:.6f}, |grad| {rep.gnorm0:.2e} -> {rep.gnorm:.2e} "
              f"({rep.n_iter} iters, {rep.wall_s:.0f}s)", file=sys.stderr)
    new = streaming_trained(
        SeFat, p_f, z_f, s2_f, X, y, variational=True,
        block_size=args.block_size or 8192,
    )
    return TrainResult(new, p_f, z_f, s2_f)


def _write_artifact(args, trained, target_mean, input_means, input_stddevs):
    from .io.checkpoint import ModelArtifact, save_model
    from .kernels import SeFat

    art = ModelArtifact(
        family_name=SeFat.name,
        kernel_params=trained.kernel_params,
        inducing=np.asarray(trained.model.inducing.z),
        coeffs=np.asarray(trained.coeffs),
        chol_km=np.asarray(trained.model.inducing.chol_km),
        r_mat=np.asarray(trained.model.r_mat),
        sigma2=float(trained.model.sigma2),
        target_mean=target_mean,
        input_means=input_means,
        input_stddevs=input_stddevs,
    )
    save_model(args.model, art)


def _train_on_device(args, X, y, n_inducing, seed, build_params, got_signal,
                     old_handler):
    """-trainer device|sharded: the TPU-native training paths at the CLI
    surface (VERDICT round-2 #3).  Same model (se_fat variational FIC),
    same artifact schema as the host loop; the optimizer runs device-
    resident (optim.lbfgs_device.fit / parallel.fit_sharded) with the
    mean-NLL objective.  -eps keeps the host trainer's TOTAL-gradient
    meaning: mean |g| < eps/n  <=>  total |g| < eps, so the same flag value
    stops both trainers at the same point.
    SIGINT stops after the in-flight chunk and keeps the incumbent (the
    device L-BFGS is monotone, so the incumbent IS the best model so far).
    """
    import jax
    import jax.numpy as jnp

    from .kernels import SeFat
    from .models.fitc import (
        calc_model,
        calc_trained,
        choose_n_random_inputs,
    )
    from .optim import Bailout, make_pack
    from .optim.lbfgs_device import fit, fit_restarts
    from .optim.train import TrainResult

    max_iter = args.max_iter if args.max_iter is not None else 100

    def start(r):
        rng = np.random.default_rng(seed + r)
        params = build_params(rng)
        key = jax.random.PRNGKey(seed + r)
        z = choose_n_random_inputs(key, SeFat, params, X, n_inducing)
        return params, z

    params0, z0 = start(0)
    pack = make_pack(SeFat, params0, z0, args.sigma2)

    common = dict(
        variational=True, step=args.step, tol=args.tol,
        epsabs=args.eps / X.shape[0], max_iter=max_iter,
    )

    last_state = {"st": None}

    def on_chunk(st):
        last_state["st"] = st
        if args.checkpoint is not None:
            from .io.resume import save_device_checkpoint

            save_device_checkpoint(args.checkpoint, st)
        if args.verbose:
            print(
                f"iter {int(st.n_iter):4d}: f={float(st.f):.6f} "
                f"|gradient|={float(jnp.linalg.norm(st.g)):.5f} "
                f"evals={int(st.n_evals)}", file=sys.stderr, flush=True,
            )
        if got_signal["flag"]:
            raise Bailout

    try:
        if args.trainer == "device":
            if args.restarts > 1:
                x0s = [pack.x0] + [
                    make_pack(SeFat, *start(r), args.sigma2).x0
                    for r in range(1, args.restarts)
                ]
                p_f, z_f, s2_f, st, probe_fs = fit_restarts(
                    SeFat, X, y, pack, x0s,
                    streaming_block_size=args.block_size, **common,
                )
                if args.verbose:
                    print(f"restart probes: "
                          f"{[round(float(f), 4) for f in probe_fs]}",
                          file=sys.stderr)
            else:
                init_state = None
                if args.resume:
                    import os

                    if os.path.exists(args.checkpoint):
                        from .io.resume import load_device_checkpoint

                        init_state = load_device_checkpoint(args.checkpoint)
                        if init_state.x.shape != pack.x0.shape:
                            raise SystemExit(
                                "checkpoint hyper vector does not match this "
                                "configuration — resume requires the same "
                                "model/data setup"
                            )
                try:
                    p_f, z_f, s2_f, st = fit(
                        SeFat, X, y, pack,
                        streaming_block_size=args.block_size,
                        init_state=init_state, state_callback=on_chunk,
                        **common,
                    )
                except Bailout:
                    st = last_state["st"]
                    p_f, z_f, s2_f = pack.unpack(st.x)
        else:  # sharded
            from .parallel import make_mesh, make_mesh_2d
            from .parallel.mesh2d import fit_sharded_2d
            from .parallel.sharded import fit_restarts_sharded, fit_sharded

            if args.devices is not None and "x" in str(args.devices):
                n_d, n_m = map(int, str(args.devices).split("x"))
                mesh = make_mesh_2d(n_d, n_m)
                fit_one = fit_sharded_2d
            else:
                mesh = make_mesh(
                    int(args.devices) if args.devices is not None else None
                )
                fit_one = fit_sharded
            if args.restarts > 1:
                # probes run CONCURRENTLY, one batch of starts per device
                # (starts axis sharded over the mesh); the winner continues
                # n-sharded — same probe-then-continue scheme as the device
                # trainer's fit_restarts
                x0s = [pack.x0] + [
                    make_pack(SeFat, *start(r), args.sigma2).x0
                    for r in range(1, args.restarts)
                ]
                p_f, z_f, s2_f, st, probe_fs = fit_restarts_sharded(
                    SeFat, mesh, X, y, pack, x0s,
                    block_size=args.block_size or 8192, **common,
                )
                if args.verbose:
                    print(f"restart probes (parallel over "
                          f"{mesh.devices.size} devices): "
                          f"{[round(float(f), 4) for f in probe_fs]}",
                          file=sys.stderr)
            else:
                try:
                    cand = fit_one(
                        SeFat, mesh, X, y, pack,
                        block_size=args.block_size or 8192,
                        state_callback=on_chunk, **common,
                    )
                except Bailout:
                    st_b = last_state["st"]
                    cand = (*pack.unpack(st_b.x), st_b)
                p_f, z_f, s2_f, st = cand
    finally:
        signal.signal(signal.SIGINT, old_handler)

    if args.block_size is not None or args.trainer == "sharded":
        from .models.streaming import streaming_trained

        trained = streaming_trained(
            SeFat, p_f, z_f, s2_f, X, y, variational=True,
            block_size=args.block_size or 8192,
        )
    else:
        model = calc_model(SeFat, p_f, X, z_f, s2_f, variational=True,
                           factorization="chol")
        trained = calc_trained(model, y)
    return TrainResult(trained, p_f, z_f, s2_f)


def cmd_test(args) -> int:
    import jax.numpy as jnp

    from .io.checkpoint import load_model
    from .models.predict import (
        CoVariancePredictor,
        MeanPredictor,
        predict_means,
        predict_variances,
    )

    art, _ = load_model(args.model)
    family = art.family
    data = read_samples(sys.stdin)
    big_dim = art.input_means.shape[0]
    if data.shape[1] != big_dim:
        raise SystemExit(
            f"incompatible dimension of inputs ({data.shape[1]}), expected "
            f"{big_dim}"
        )
    inputs = (data - art.input_means) / art.input_stddevs
    X = jnp.asarray(inputs)
    params = art.kernel_params

    mp = MeanPredictor(z=jnp.asarray(art.inducing), coeffs=jnp.asarray(art.coeffs))
    means = np.asarray(predict_means(family, params, mp, X)) + art.target_mean

    if args.with_stddev:
        cvp = CoVariancePredictor(
            z=jnp.asarray(art.inducing),
            chol_km=jnp.asarray(art.chol_km),
            r_mat=jnp.asarray(art.r_mat),
        )
        variances = np.asarray(
            predict_variances(
                family, params, cvp, X, art.sigma2, predictive=args.predictive
            )
        )
        for mean, var in zip(means, variances):
            print(f"{mean:f},{math.sqrt(max(var, 0.0)):f}")
    else:
        for mean in means:
            print(f"{mean:f}")
    return 0


def _configure_jax():
    """The CLI reproduces the reference's numerics, which are f64 LAPACK —
    run in f64 (slow-but-correct on TPU, native on CPU).  GPR_TPU_PLATFORM
    overrides the backend (the sandbox sitecustomize pins JAX_PLATFORMS)."""
    import os

    import jax

    platform = os.environ.get("GPR_TPU_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    jax.config.update("jax_enable_x64", True)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    _configure_jax()
    try:
        if args.cmd == "train":
            return cmd_train(args)
        return cmd_test(args)
    except FileNotFoundError as e:
        raise SystemExit(f"cannot open model file: {e.filename}")
    except FloatingPointError as e:
        raise SystemExit(
            f"training failed: {e} (check inputs for NaN/inf values)"
        )
    except BrokenPipeError:
        # downstream closed the pipe (e.g. | head) — exit quietly, the
        # POSIX-tool convention
        import os

        try:
            sys.stdout.close()
        except Exception:  # noqa: BLE001
            pass
        os._exit(0)


if __name__ == "__main__":
    raise SystemExit(main())
