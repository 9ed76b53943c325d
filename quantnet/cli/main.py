"""quantnet CLI: train / quantize / evaluate / bench / report / experiment.

The working end-to-end pipeline the reference promised but broke
(run_experiment.py:7 imported a module that doesn't exist — SURVEY.md known
gaps; main.py's eval pipeline required a checkpoint stripped from the repo).
`experiment` = train -> quantize (all three schemes) -> evaluate -> bench ->
report, each stage resumable from artifacts on disk (--skip-training keeps the
reference's resume semantics, run_experiment.py:24).

Usage:
    python -m quantnet train --epochs 20 --batch-size 128
    python -m quantnet quantize --scheme static --ckpt saved_models/best
    python -m quantnet evaluate --models fp32,dynamic,static,weight_only
    python -m quantnet bench --batch-sizes 1,32,1024
    python -m quantnet experiment --epochs 5
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
from typing import Dict, Tuple

import jax


def _torch_pad(meta) -> bool:
    """Imported reference checkpoints need torch's symmetric stride-2 conv
    padding (quantnet/models/resnet.py::apply torch_pad) — recorded in the
    fp32 artifact's meta by cmd_import_torch and honored by every stage."""
    return bool(meta and meta.get("torch_pad"))


def _build_model(
    name: str,
    num_classes: int,
    seed: int = 0,
    conv1_scale: float = 1.0,
    zero_init_residual: bool = False,
    torch_pad: bool = False,
):
    init_kwargs = {}
    if name == "simple_convnet":
        from quantnet.models import convnet as mod

        apply_fn = mod.apply
    elif name.startswith("resnet"):
        import functools

        from quantnet.models import resnet as mod

        try:
            depth = int(name[len("resnet"):])
        except ValueError:
            raise SystemExit(f"unknown model {name!r}")
        if depth not in mod.VARIANTS:
            raise SystemExit(
                f"unknown resnet depth {depth} (have {sorted(mod.VARIANTS)})"
            )
        init_kwargs["depth"] = depth
        if zero_init_residual:
            init_kwargs["zero_init_residual"] = True
        # conv1_scale: the reference's custom input-scale knob on the stem conv
        # (models/dynamic_ptq_model.py:13-32,157-164).
        # torch_pad: symmetric stride-2 padding for imported torch weights.
        kw = {}
        if conv1_scale != 1.0:
            kw["conv1_scale"] = conv1_scale
        if torch_pad:
            kw["torch_pad"] = True
        apply_fn = functools.partial(mod.apply, **kw) if kw else mod.apply
    elif name.startswith("mobilenetv2"):
        import functools

        from quantnet.models import mobilenet as mod

        # optional width suffix: mobilenetv2_0.5 etc.
        if "_" in name:
            try:
                init_kwargs["width_mult"] = float(name.split("_", 1)[1])
            except ValueError:
                raise SystemExit(f"unknown model {name!r}")
        apply_fn = (
            functools.partial(mod.apply, torch_pad=True) if torch_pad else mod.apply
        )
    else:
        raise SystemExit(f"unknown model {name!r}")
    params, state = mod.init(
        jax.random.PRNGKey(seed), num_classes=num_classes, **init_kwargs
    )
    return apply_fn, params, state


def _load_data(args):
    dataset = getattr(args, "dataset", "cifar10")
    if dataset == "cifar10":
        from quantnet.data.datasets import CIFAR10_CLASSES, load_cifar10

        train, test = load_cifar10(
            args.data_dir,
            synthetic_train_size=args.synthetic_train_size,
            synthetic_test_size=args.synthetic_test_size,
        )
        return train, test, CIFAR10_CLASSES
    if dataset == "imagenet":
        from quantnet.data.datasets import load_imagenet

        train, test = load_imagenet(
            args.data_dir,
            image_size=args.image_size,
            synthetic_train_size=args.synthetic_train_size,
            synthetic_test_size=args.synthetic_test_size,
            num_classes=args.num_classes,
        )
        return train, test, None
    if dataset == "synthetic":
        from quantnet.data.datasets import make_synthetic

        train, test = make_synthetic(
            args.num_classes,
            args.image_size,
            args.synthetic_train_size,
            args.synthetic_test_size,
        )
        return train, test, None
    raise SystemExit(f"unknown dataset {dataset!r}")


def _artifact_path(save_dir: str, name: str) -> str:
    return os.path.join(save_dir, name)


def _quantize_all(apply_fn, params, state, train_data, args) -> Dict[str, Tuple[dict, dict]]:
    from quantnet.quantize import bf16, dynamic, static, weight_only
    from quantnet.quantize.policy import quantize_optimized

    # islice, NOT list(...)[:n]: materializing the whole epoch of assembled
    # f32 batches to keep `calibration_batches` of them is O(epoch) host RAM
    # (~30 GB on ImageNet-val at 224 px) — exactly the materialization the
    # u8-resident pipeline exists to avoid.
    calib = list(
        itertools.islice(
            train_data.batches(args.batch_size, drop_remainder=True),
            args.calibration_batches,
        )
    )
    from quantnet.quantize.fold import fold_model_jit

    out = {}
    out["bf16"] = bf16.quantize(params, state)
    # per-tensor weight scales on request (the reference's engine default:
    # torch default_dynamic_qconfig is per-tensor — SURVEY.md component 2);
    # per-channel is this framework's default and measured-better config.
    pc = not getattr(args, "per_tensor", False)
    out["dynamic"] = dynamic.quantize(params, state, per_channel=pc)
    # One calibration pass serves every static-activation tier (INT8 + W4A8).
    skip_first = getattr(args, "skip_first_layer", False)
    pre_add = getattr(args, "pre_add_quant", False)
    fparams, fstate = fold_model_jit(params, state)
    act_qparams = static.calibrate(
        apply_fn, fparams, fstate, calib, observer=args.observer,
        include_output_stats=pre_add,
    )
    out["static"] = static.bake(
        fparams, fstate, act_qparams, per_channel=pc,
        skip_first_layer=skip_first, pre_add_quant=pre_add,
    )
    out["weight_only"] = weight_only.quantize(params, state, per_channel=pc)
    # Sub-byte tier (beyond the reference): 4-bit weights with group-wise
    # scales on linear layers — ~8x weight compression at the same epilogue
    # cost; see quantnet/quantize/weight_only.py.
    int4_gs = getattr(args, "int4_group_size", 128) or None
    # Measured int4 guard (opt-in): layers whose int4 damage is an outlier
    # keep 8-bit weights inside the sub-byte tiers
    # (quantnet/quantize/policy.py::int4_guard; ~0.4% size cost where it
    # triggers, docs/PERF.md round 4).
    guard_rel = getattr(args, "int4_guard", 0.0) or 0.0
    guard = {}
    if guard_rel > 0:
        from quantnet.quantize.common import first_layer_path
        from quantnet.quantize.policy import int4_guard

        guard = int4_guard(
            apply_fn, params, state, calib[:2],
            group_size=int4_gs, rel_threshold=guard_rel,
        )
        if guard:
            print(f"int4 guard: 8-bit weights kept at {sorted(guard)}")
    out["weight_only_int4"] = weight_only.quantize(
        params, state, bits=4, group_size=int4_gs, layer_policy=guard or None,
    )
    # W4A8: 4-bit weights INSIDE the static int8-activation MXU path —
    # sub-byte size AND static's speedup (quantnet/quantize/static.py).
    w4a8_guard = dict(guard)
    if skip_first and w4a8_guard:
        # the stem is already fp32-skipped on this tier; an explicit policy
        # entry would override the skip and statically quantize it instead
        w4a8_guard.pop(first_layer_path(fparams), None)
    out["w4a8"] = static.bake(
        fparams, fstate, act_qparams,
        skip_first_layer=skip_first, weight_bits=4, weight_group_size=int4_gs,
        layer_policy=w4a8_guard or None,
    )
    # Learned rounding (AdaRound-style) on the sub-byte tiers. Opt-in
    # (quantnet/quantize/adaround.py); see docs/PERF.md for the measured
    # on-chip A/B at the shipped config.
    ar_steps = getattr(args, "adaround_steps", 0)
    if ar_steps:
        from quantnet.quantize import adaround

        requested = getattr(args, "scheme", "all")
        for tier in ("weight_only_int4", "w4a8"):
            if requested not in ("all", tier):
                continue  # don't pay hundreds of steps for unselected tiers
            out[tier] = adaround.refine(
                *out[tier], params, state, apply_fn, calib, steps=ar_steps,
            )
    # Empirical bias correction on the sub-byte tiers (Nagel et al. 2019
    # §4.2, quantnet/quantize/bias_correct.py): remove the measured
    # per-channel expected error of weight quantization. Opt-in; composes
    # with (runs after) AdaRound.
    if getattr(args, "bias_correct", False):
        from quantnet.quantize.bias_correct import bias_correct

        requested = getattr(args, "scheme", "all")
        for tier in ("weight_only_int4", "w4a8"):
            if requested not in ("all", tier):
                continue
            out[tier] = bias_correct(
                *out[tier], params, state, apply_fn, calib
            )
    # Measured sensitivity is one compiled program regardless of depth
    # (ProbeGate sweep, quantnet/quantize/policy.py), so it is the default
    # for every model — ResNet-50 included.
    importance = getattr(args, "importance", None) or "sensitivity"
    qp, qs, policy = quantize_optimized(
        params, state, apply_fn,
        calib[: max(args.calibration_batches // 4, 1)],
        importance=importance,
        low_precision_scheme=getattr(args, "optimized_low_tier", "weight_only"),
        int4_group_size=int4_gs,
    )
    out["optimized"] = (qp, qs)
    out["_policy"] = policy
    return out


def cmd_train(args):
    from quantnet.core.config import TrainConfig
    from quantnet.train.trainer import Trainer

    train_data, test_data, _ = _load_data(args)
    apply_fn, params, state = _build_model(
        args.model, train_data.num_classes, args.seed, args.conv1_scale,
        zero_init_residual=getattr(args, "zero_init_residual", False),
    )
    cfg = TrainConfig(
        epochs=args.epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        optimizer=args.optimizer,
        seed=args.seed,
        save_dir=args.save_dir,
        aug_rotation_deg=getattr(args, "aug_rotation", 0.0),
        aug_color_jitter=getattr(args, "aug_color_jitter", 0.0),
        warmup_epochs=getattr(args, "warmup_epochs", 0.0),
    )
    trainer = Trainer(apply_fn, params, state, cfg, train_data, test_data)
    params, state = trainer.train(
        save_path=os.path.join(args.save_dir, "best") if args.save_dir else None,
        resume=getattr(args, "resume", False),
    )
    from quantnet.train import checkpoint as ckpt

    os.makedirs(args.save_dir, exist_ok=True)
    ckpt.save_artifact(
        _artifact_path(args.save_dir, "fp32"),
        {"params": params, "state": state},
        {"model": args.model, "best_accuracy": trainer.best_accuracy},
    )
    trainer.save_history(os.path.join(args.save_dir, "history.jsonl"))
    print(f"best accuracy: {trainer.best_accuracy:.4f}")
    return params, state


def _load_fp32(args):
    from quantnet.train import checkpoint as ckpt

    path = _artifact_path(args.save_dir, "fp32")
    if not os.path.exists(path + ".json"):
        return None
    tree, meta = ckpt.load_artifact(path)
    return tree["params"], tree["state"], meta


def cmd_quantize(args):
    from quantnet.train import checkpoint as ckpt

    loaded = _load_fp32(args)
    if loaded is None:
        raise SystemExit(f"no fp32 artifact under {args.save_dir}; run train first")
    params, state, meta = loaded
    train_data, _, _ = _load_data(args)
    apply_fn, _, _ = _build_model(
        args.model, train_data.num_classes, conv1_scale=args.conv1_scale,
        torch_pad=_torch_pad(meta),
    )
    if getattr(args, "equalize", False):
        # Data-free cross-layer range equalization before every scheme
        # (quantnet/quantize/equalize.py) — the per-tensor deployment
        # configs' accuracy repair; function-preserving, so per-channel
        # schemes are unaffected in exact arithmetic.
        from quantnet.quantize.equalize import cross_layer_equalize

        params, state = cross_layer_equalize(params, state)
        print("applied cross-layer equalization")
    schemes = _quantize_all(apply_fn, params, state, train_data, args)
    policy = schemes.pop("_policy", None)
    for name, (qp, qs) in schemes.items():
        if args.scheme not in ("all", name):
            continue
        ckpt.save_artifact(
            _artifact_path(args.save_dir, name),
            {"params": qp, "state": qs},
            {"model": args.model, "scheme": name,
             "policy": policy if name == "optimized" else None},
        )
        print(f"saved {name} artifact")


def cmd_qat(args):
    """Quantization-aware training: finetune the fp32 artifact through fake
    quantization (quantnet/quantize/qat.py), bake a deployable tree, save it
    as the 'qat' artifact (evaluate/bench/report pick it up alongside the PTQ
    schemes).

    --weight-bits 4 targets the sub-byte tiers (the tiers where PTQ
    organically loses accuracy): the default bake is the W4A8 contract
    (saved as 'qat_w4a8'); --weight-only trains/bakes the weight_only_int4
    contract instead ('qat_int4'). --init-from w4a8 (or weight_only_int4)
    starts the finetune from that artifact's — typically AdaRound-refined —
    weights instead of the raw fp32 tree."""
    from quantnet.core.config import TrainConfig
    from quantnet.quantize import qat
    from quantnet.train import checkpoint as ckpt
    from quantnet.train.trainer import Trainer

    loaded = _load_fp32(args)
    if loaded is None:
        raise SystemExit(f"no fp32 artifact under {args.save_dir}; run train first")
    params, state, meta = loaded
    train_data, test_data, _ = _load_data(args)
    apply_fn, _, _ = _build_model(
        args.model, train_data.num_classes, conv1_scale=args.conv1_scale,
        torch_pad=_torch_pad(meta),
    )
    calib = list(
        itertools.islice(
            train_data.batches(args.batch_size, drop_remainder=True),
            args.calibration_batches,
        )
    )
    weight_bits = getattr(args, "weight_bits", 8)
    weight_only = getattr(args, "weight_only", False)
    if weight_only and weight_bits == 8 and not getattr(args, "artifact_name", ""):
        # A weight-only int8 QAT tree would silently take the 'qat' name and
        # masquerade as the static-INT8 QAT row in evaluate/report.
        raise SystemExit(
            "--weight-only targets the sub-byte tier; pass --weight-bits 4 "
            "(or an explicit --artifact-name for a weight-only int8 QAT)"
        )
    group_size = (
        (getattr(args, "weight_group_size", 128) or None)
        if weight_bits == 4 else None
    )
    # Measured int4 guard inside a sub-byte QAT (same semantics as the
    # quantize command): outlier layers train and bake at 8-bit weights.
    guard = {}
    guard_rel = getattr(args, "int4_guard", 0.0) or 0.0
    if weight_bits == 4 and guard_rel > 0:
        from quantnet.quantize.common import first_layer_path
        from quantnet.quantize.policy import int4_guard

        guard = int4_guard(
            apply_fn, params, state, calib[:2],
            group_size=group_size, rel_threshold=guard_rel,
        )
        if guard and getattr(args, "skip_first_layer", False):
            guard.pop(first_layer_path(params), None)
        if guard:
            print(f"int4 guard: 8-bit weight islands at {sorted(guard)}")
    init_from = getattr(args, "init_from", "") or ""
    fold = True
    if init_from:
        src = _artifact_path(args.save_dir, init_from)
        if not os.path.exists(src + ".json"):
            raise SystemExit(f"--init-from artifact {src!r} not found; "
                             "run quantize first")
        tree, _ = ckpt.load_artifact(src)
        # Quantized artifacts are BN-folded; rebuild fp32 weights on the
        # (refined) rounding grid and skip the re-fold.
        params, state = qat.dequantize_tree(tree["params"]), tree["state"]
        fold = False
    qp, qs = qat.prepare(
        params, state, apply_fn, calib, observer=args.observer,
        per_channel=not getattr(args, "per_tensor", False),
        skip_first_layer=getattr(args, "skip_first_layer", False),
        # weight-only tier keeps the classifier fp32 (reference
        # custom_quantization_model.py:219, weight_only.quantize default)
        skip_last_layer=weight_only,
        layer_policy=guard or None,
        weight_bits=weight_bits,
        weight_group_size=group_size,
        act_quant=not weight_only,
        fold=fold,
    )
    cfg = TrainConfig(
        epochs=args.epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        optimizer=args.optimizer,
        seed=args.seed,
        save_dir=args.save_dir,
        # The BN-folded STE graph has no normalization left to damp an
        # unlucky step; without clipping the finetune diverged on-chip
        # (docs/PERF.md round 3, QAT stabilization).
        grad_clip_norm=getattr(args, "grad_clip_norm", 1.0),
    )
    trainer = Trainer(apply_fn, qp, qs, cfg, train_data, test_data)
    qp, qs = trainer.train()  # best-accuracy tree, reloaded at train end
    baked = qat.bake(qp)
    name = getattr(args, "artifact_name", "") or (
        "qat" if weight_bits == 8
        else ("qat_int4" if weight_only else "qat_w4a8")
    )
    os.makedirs(args.save_dir, exist_ok=True)
    ckpt.save_artifact(
        _artifact_path(args.save_dir, name),
        {"params": baked, "state": qs},
        {"model": args.model, "scheme": name,
         "weight_bits": weight_bits, "init_from": init_from or None,
         "qat_best_accuracy": trainer.best_accuracy},
    )
    print(f"qat finetune best accuracy (fake-quant graph): "
          f"{trainer.best_accuracy:.4f}; saved {name} artifact")


def _collect_models(args):
    """Load every available artifact into {name: (apply_fn, params, state)}."""
    from quantnet.train import checkpoint as ckpt

    train_data, test_data, classes = _load_data(args)
    # torch_pad is a property of the weight family: every artifact in a
    # save_dir derives from the same fp32 tree, so its meta decides.
    fp32_meta = None
    fp32_loaded = _load_fp32(args)
    if fp32_loaded is not None:
        fp32_meta = fp32_loaded[2]
    apply_fn, _, _ = _build_model(
        args.model, train_data.num_classes, conv1_scale=args.conv1_scale,
        torch_pad=_torch_pad(fp32_meta),
    )
    models = {}
    for name in ["fp32", "bf16", "dynamic", "static", "weight_only",
                 "weight_only_int4", "w4a8", "optimized", "qat",
                 "qat_int4", "qat_w4a8"]:
        path = _artifact_path(args.save_dir, name)
        if os.path.exists(path + ".json"):
            tree, _ = ckpt.load_artifact(path)
            models[name] = (apply_fn, tree["params"], tree["state"])
    return models, test_data, classes


def cmd_evaluate(args):
    from quantnet.evaluation.evaluator import compare_models

    models, test_data, classes = _collect_models(args)
    if not models:
        raise SystemExit("no artifacts to evaluate; run train/quantize first")
    subset = [m for m in (getattr(args, "models", "") or "").split(",") if m]
    if subset:
        missing = [m for m in subset if m not in models]
        if missing:
            raise SystemExit(f"no artifacts for {missing}; have {sorted(models)}")
        models = {m: models[m] for m in subset}
    results = compare_models(
        models, test_data, batch_size=args.eval_batch_size, class_names=classes
    )
    os.makedirs(args.results_dir, exist_ok=True)
    out_path = os.path.join(args.results_dir, "accuracy.json")
    if subset and os.path.exists(out_path):
        # Subset re-evaluation MERGES into the existing table — a user
        # re-measuring one scheme must not silently clobber the other rows.
        with open(out_path) as f:
            merged = json.load(f)
        merged.update(results)
        results_to_write = merged
    else:
        results_to_write = results
    with open(out_path, "w") as f:
        json.dump(results_to_write, f, indent=2, default=str)
    for name, r in results.items():
        print(f"{name}: top1={r['top1']:.4f} top5={r['top5']:.4f} (n={r['n']})")
        if getattr(args, "per_class", False) and r.get("per_class"):
            # reference evaluate_class_accuracy printed per-class accuracy
            # sorted descending, top 20 (utils/model_evaluator.py:57-121)
            ranked = sorted(r["per_class"].items(), key=lambda kv: -kv[1])
            for cls, acc in ranked[:20]:
                print(f"    {cls}: {acc:.4f}")
    return results


def cmd_bench(args):
    from quantnet.bench.benchmark import InferenceBenchmark

    models, test_data, _ = _collect_models(args)
    if not models:
        raise SystemExit("no artifacts to bench; run train/quantize first")
    if getattr(args, "s4_runtime", False):
        # True 4-bit HBM payloads for the sub-byte tiers' bench rows
        # (quantnet/quantize/common.py::s4_runtime_tree; numerics identical,
        # weight bytes halved — the bs=1 serving lever).
        from quantnet.quantize.common import s4_io_supported, s4_runtime_tree

        if not s4_io_supported():
            # Measured platform verdict (docs/PERF.md round 5): some TPU
            # stacks decline int4 program inputs with an opaque client
            # RecursionError — surface the real reason instead.
            raise SystemExit(
                "--s4-runtime: this backend cannot pass int4 arrays into "
                "jitted programs (s4 I/O unsupported; see docs/PERF.md "
                "round 5) — benching the int8-wide payloads instead"
            )
        models = {
            name: (fn, s4_runtime_tree(p), s)
            for name, (fn, p, s) in models.items()
        }
    bench = InferenceBenchmark(
        image_size=test_data.image_size,
        warmup=args.warmup,
        iters=args.iters,
    )
    batch_sizes = [int(b) for b in args.batch_sizes.split(",")]
    results = bench.compare_models(models, batch_sizes)
    os.makedirs(args.results_dir, exist_ok=True)
    with open(os.path.join(args.results_dir, "benchmark.json"), "w") as f:
        json.dump(results, f, indent=2)
    for name, r in results.items():
        for bs in batch_sizes:
            s = r[f"bs{bs}"]
            print(
                f"{name} bs={bs}: {s['mean_ms']:.3f}ms "
                f"({s['images_per_s']:.1f} img/s)"
            )
    return results


def cmd_import_torch(args):
    """Convert a reference PyTorch .pth checkpoint into the fp32 artifact
    (so quantize/evaluate/bench/report run on reference-trained weights)."""
    from quantnet.models.torch_import import import_checkpoint
    from quantnet.train import checkpoint as ckpt

    params, state, best = import_checkpoint(args.ckpt, args.model)
    os.makedirs(args.save_dir, exist_ok=True)
    ckpt.save_artifact(
        _artifact_path(args.save_dir, "fp32"),
        {"params": params, "state": state},
        {"model": args.model, "best_accuracy": best, "imported_from": args.ckpt,
         # imported torch weights need symmetric stride-2 conv padding
         # (quantnet/models/resnet.py::apply torch_pad, mobilenet.py ditto);
         # convnet forwards are padding-identical either way.
         "torch_pad": args.model.startswith(("resnet", "mobilenetv2"))},
    )
    msg = f"imported {args.ckpt} -> {args.save_dir}/fp32"
    if best is not None:
        msg += f" (best_accuracy {best:.4f})"
    print(msg)


def cmd_serve(args):
    """Continuous-batching serving demo/load-test over a saved artifact."""
    import time as _time

    import numpy as np

    from quantnet.serve import InferenceEngine

    models, test_data, _ = _collect_models(args)
    if not models:
        raise SystemExit("no artifacts to serve; run train/quantize first")
    name = args.scheme if args.scheme in models else sorted(models)[0]
    apply_fn, params, state = models[name]
    mesh = None
    if args.data_parallel != 1:
        from quantnet.parallel.mesh import make_mesh

        mesh = make_mesh(data_parallel=args.data_parallel)
    shape = (test_data.image_size, test_data.image_size, test_data.channels)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    rng = np.random.default_rng(args.seed)
    wire_kwargs = {}
    if getattr(args, "wire", "f32") == "u8":
        # uint8 wire: raw u8 payloads, normalize on device with the data
        # pipeline's stats — 4x less transfer per request (the 224px
        # deployment config; quantnet/serve/server.py).
        mean = test_data.mean if test_data.mean is not None else np.zeros(
            shape[-1], np.float32
        )
        std = test_data.std if test_data.std is not None else np.ones(
            shape[-1], np.float32
        )
        wire_kwargs = {"wire_dtype": "uint8", "normalize": (mean, std)}
        images = rng.integers(0, 256, size=(args.requests, *shape)).astype(
            np.uint8
        )
    else:
        images = rng.normal(size=(args.requests, *shape)).astype(np.float32)
    with InferenceEngine(
        apply_fn, params, state, image_shape=shape, buckets=buckets,
        max_wait_ms=args.max_wait_ms, mesh=mesh, **wire_kwargs,
    ) as eng:
        t0 = _time.perf_counter()
        futs = [eng.submit(img) for img in images]
        for f in futs:
            f.result()
        dt = _time.perf_counter() - t0
        stats = dict(eng.stats)
        occ = eng.occupancy()
    print(
        f"served {args.requests} requests with '{name}' in {dt:.3f}s "
        f"({args.requests / dt:.1f} req/s), {int(stats['batches'])} batches, "
        f"occupancy {occ:.1%}"
    )


def cmd_scaling(args):
    """Data-parallel scaling-efficiency sweep over the available devices."""
    from quantnet.bench.scaling import measure_scaling

    models, test_data, _ = _collect_models(args)
    if models:
        name = "static" if "static" in models else sorted(models)[0]
        apply_fn, params, state = models[name]
    else:
        name = "fp32-init"
        apply_fn, params, state = _build_model(
            args.model, args.num_classes, args.seed, args.conv1_scale
        )
    res = measure_scaling(
        apply_fn, params, state,
        image_size=args.image_size,
        per_device_batch=args.per_device_batch,
        iters=args.iters,
    )
    os.makedirs(args.results_dir, exist_ok=True)
    with open(os.path.join(args.results_dir, "scaling.json"), "w") as f:
        json.dump({"model": name, **{k: {str(n): v for n, v in d.items()}
                                     for k, d in res.items()}}, f, indent=2)
    for n, tp in sorted(res["throughput"].items()):
        eff = res["efficiency"].get(n, 1.0)
        print(f"{name} x{n} devices: {tp:.1f} img/s (efficiency {eff:.1%})")
    return res


def cmd_report(args):
    from quantnet.report.analyzer import ResultAnalyzer, create_detailed_report

    acc_path = os.path.join(args.results_dir, "accuracy.json")
    bench_path = os.path.join(args.results_dir, "benchmark.json")
    if not (os.path.exists(acc_path) and os.path.exists(bench_path)):
        raise SystemExit("need accuracy.json and benchmark.json; run evaluate + bench")
    with open(acc_path) as f:
        accuracy = json.load(f)
    with open(bench_path) as f:
        benchmark = json.load(f)
    analyzer = ResultAnalyzer(args.results_dir)
    table = analyzer.compare_quantization_methods(accuracy, benchmark, batch_size=args.report_batch_size)
    report = create_detailed_report(table, args.results_dir)
    print(report)


def cmd_experiment(args):
    """Full pipeline: the fixed run_experiment.py. With --qat-epochs > 0
    (default 2) the QAT finetune runs after PTQ quantization, so the
    evaluate/bench/report stages cover the COMPLETE scheme matrix — PTQ
    tiers and QAT — in one run."""
    loaded = _load_fp32(args) if args.skip_training else None
    if loaded is None:
        cmd_train(args)
    args.scheme = "all"
    cmd_quantize(args)
    qat_epochs = getattr(args, "qat_epochs", 0)
    if qat_epochs > 0:
        qat_args = argparse.Namespace(**vars(args))
        qat_args.epochs = qat_epochs
        # finetune lr: ~1/10 of from-scratch (the qat subcommand's default)
        qat_args.lr = args.lr * 0.1
        cmd_qat(qat_args)
    cmd_evaluate(args)
    cmd_bench(args)
    cmd_report(args)


def _train_recipe_args(sp):
    sp.add_argument("--warmup-epochs", type=float, default=0.0,
                    help="linear lr warmup into the cosine schedule "
                         "(from-scratch deep-ResNet recipe; 0 = reference's "
                         "plain cosine)")
    sp.add_argument("--zero-init-residual", action="store_true",
                    help="zero the last BN gamma of every residual block "
                         "(torchvision zero_init_residual)")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="quantnet")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--config", default=None,
                        help="JSON file of {flag_dest: value} defaults "
                             "(CLI flags override it)")
        sp.add_argument("--model", default=None,
                        help="simple_convnet | resnet18/34/50/101/152 "
                             "(default: simple_convnet; resnet50 for imagenet)")
        sp.add_argument("--dataset", default="cifar10",
                        choices=["cifar10", "imagenet", "synthetic"])
        sp.add_argument("--image-size", type=int, default=None,
                        help="default: 32 (cifar10/synthetic), 224 (imagenet)")
        sp.add_argument("--num-classes", type=int, default=None,
                        help="default: 10 (cifar10/synthetic), 1000 (imagenet)")
        sp.add_argument("--conv1-scale", type=float, default=1.0,
                        help="resnet50 stem input scale (reference custom_scale)")
        sp.add_argument("--importance", default=None,
                        choices=[None, "sensitivity", "static_map"],
                        help="layer-importance source for the optimized scheme")
        sp.add_argument("--data-dir", default="./data")
        sp.add_argument("--save-dir", default="./saved_models")
        sp.add_argument("--results-dir", default="./results")
        sp.add_argument("--batch-size", type=int, default=128)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--synthetic-train-size", type=int, default=12800,
                        help="fallback dataset size when no real data on disk")
        sp.add_argument("--synthetic-test-size", type=int, default=2560)

    sp = sub.add_parser("train")
    common(sp)
    sp.add_argument("--epochs", type=int, default=20)
    sp.add_argument("--lr", type=float, default=0.1)
    sp.add_argument("--optimizer", default="sgd_cosine",
                    choices=["sgd_cosine", "adam_plateau"])
    sp.add_argument("--resume", action="store_true",
                    help="continue from the best checkpoint in --save-dir")
    sp.add_argument("--aug-rotation", type=float, default=0.0,
                    help="random rotation range in degrees (reference "
                         "RandomRotation(15)); 0 disables")
    sp.add_argument("--aug-color-jitter", type=float, default=0.0,
                    help="brightness/contrast/saturation jitter strength "
                         "(reference ColorJitter(.2,.2,.2)); 0 disables")
    _train_recipe_args(sp)
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("quantize")
    common(sp)
    sp.add_argument("--scheme", default="all",
                    choices=["all", "bf16", "dynamic", "static", "weight_only",
                             "weight_only_int4", "w4a8", "optimized"])
    sp.add_argument("--observer", default="minmax",
                    choices=["minmax", "moving_average", "histogram", "mse"])
    sp.add_argument("--calibration-batches", type=int, default=16)
    sp.add_argument("--per-tensor", action="store_true",
                    help="per-tensor weight scales instead of per-channel "
                         "(the reference engine's default; measurably "
                         "lossier on convnets — see docs/ qat_recovery)")
    sp.add_argument("--int4-group-size", type=int, default=128,
                    help="weight_only_int4: group-wise scale granularity "
                         "along the reduction dim of linear layers "
                         "(0 = per-channel only)")
    sp.add_argument("--optimized-low-tier", default="weight_only",
                    choices=["weight_only", "int4"],
                    help="optimized scheme: precision tier for the "
                         "least-sensitive layers")
    sp.add_argument("--adaround-steps", type=int, default=0,
                    help="learned-rounding (AdaRound-style) refinement steps "
                         "for the sub-byte tiers (weight_only_int4 + w4a8); "
                         "0 disables (quantnet/quantize/adaround.py)")
    sp.add_argument("--int4-guard", type=float, default=0.0,
                    help="sub-byte tiers: keep 8-bit weights at layers whose "
                         "measured int4 damage exceeds this multiple of the "
                         "median (0 disables; 50 catches the early-layer "
                         "outliers on resnet at 224px - docs/PERF.md)")
    sp.add_argument("--skip-first-layer", action="store_true",
                    help="static scheme: keep the stem in fp32 compute "
                         "(int8 handoff out) — faster and more accurate for "
                         "C=3 image stems on TPU (docs/PERF.md)")
    sp.add_argument("--pre-add-quant", action="store_true",
                    help="static scheme: quantize residual operands before "
                         "the add in downsample blocks (reference residual "
                         "semantics; bandwidth win on TPU)")
    sp.add_argument("--equalize", action="store_true",
                    help="cross-layer equalization before quantizing "
                         "(data-free range rebalancing, Nagel et al. 2019) "
                         "— repairs per-tensor configs on checkpoints with "
                         "pathological per-channel spread")
    sp.add_argument("--bias-correct", action="store_true",
                    help="empirical bias correction on the sub-byte tiers: "
                         "subtract the measured per-channel expected "
                         "weight-quantization error from layer biases "
                         "(runs after AdaRound when both are enabled)")
    sp.set_defaults(fn=cmd_quantize)

    sp = sub.add_parser("qat")
    common(sp)
    sp.add_argument("--epochs", type=int, default=2,
                    help="QAT finetune epochs (short, from the fp32 artifact)")
    sp.add_argument("--lr", type=float, default=0.01,
                    help="finetune lr (≈1/10 of from-scratch training)")
    sp.add_argument("--optimizer", default="sgd_cosine",
                    choices=["sgd_cosine", "adam_plateau"])
    sp.add_argument("--observer", default="minmax",
                    choices=["minmax", "moving_average", "histogram", "mse"])
    sp.add_argument("--calibration-batches", type=int, default=16)
    sp.add_argument("--grad-clip-norm", type=float, default=1.0,
                    help="global-norm gradient clip for the finetune "
                         "(0 disables; the BN-folded STE graph diverges "
                         "without it — docs/PERF.md round 3)")
    sp.add_argument("--per-tensor", action="store_true",
                    help="per-tensor weight fake quant (match a per-tensor "
                         "deployed graph — see quantize --per-tensor)")
    sp.add_argument("--skip-first-layer", action="store_true",
                    help="keep the stem fp32 (deployment policy; see quantize)")
    sp.add_argument("--weight-bits", type=int, default=8, choices=[8, 4],
                    help="weight fake-quant width; 4 = sub-byte QAT, the "
                         "tiers where PTQ organically loses accuracy")
    sp.add_argument("--weight-group-size", type=int, default=128,
                    help="group-wise scale granularity for 4-bit linear "
                         "weights (0 = per-channel; see quantize "
                         "--int4-group-size)")
    sp.add_argument("--weight-only", action="store_true",
                    help="train/bake the weight_only_int4 contract "
                         "(fp32 activations, classifier fp32) instead of "
                         "W4A8")
    sp.add_argument("--init-from", default="",
                    help="start the finetune from this quantized artifact's "
                         "(typically AdaRound-refined) weights, e.g. 'w4a8' "
                         "or 'weight_only_int4'")
    sp.add_argument("--int4-guard", type=float, default=0.0,
                    help="rel-damage threshold: outlier layers train/bake "
                         "at 8-bit weights inside a sub-byte QAT (see "
                         "quantize --int4-guard)")
    sp.add_argument("--artifact-name", default="",
                    help="override the saved artifact name (defaults: qat / "
                         "qat_w4a8 / qat_int4 by config)")
    sp.set_defaults(fn=cmd_qat)

    sp = sub.add_parser("evaluate")
    common(sp)
    sp.add_argument("--eval-batch-size", type=int, default=512)
    sp.add_argument("--models", default="",
                    help="comma-separated subset of artifacts to evaluate "
                         "(default: all present); subset results MERGE into "
                         "an existing accuracy.json instead of replacing it")
    sp.add_argument("--per-class", action="store_true",
                    help="print per-class accuracy (top 20, sorted desc)")
    sp.set_defaults(fn=cmd_evaluate)

    sp = sub.add_parser("bench")
    common(sp)
    sp.add_argument("--batch-sizes", default="1,32,1024")
    sp.add_argument("--warmup", type=int, default=10)
    sp.add_argument("--iters", type=int, default=100)
    sp.add_argument("--s4-runtime", action="store_true",
                    help="cast sub-byte tiers' weight payloads to true 4-bit "
                         "HBM residency before benching (identical numerics; "
                         "halves weight bytes — the bs=1 serving lever)")
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser("report")
    common(sp)
    sp.add_argument("--report-batch-size", type=int, default=32)
    sp.set_defaults(fn=cmd_report)

    sp = sub.add_parser("scaling")
    common(sp)
    sp.add_argument("--per-device-batch", type=int, default=256)
    sp.add_argument("--iters", type=int, default=20)
    sp.set_defaults(fn=cmd_scaling)

    sp = sub.add_parser("import-torch")
    common(sp)
    sp.add_argument("--ckpt", required=True,
                    help=".pth checkpoint (reference full-dict or raw state_dict)")
    sp.set_defaults(fn=cmd_import_torch)

    sp = sub.add_parser("serve")
    common(sp)
    sp.add_argument("--scheme", default="static",
                    help="artifact to serve (falls back to any available)")
    sp.add_argument("--requests", type=int, default=256)
    sp.add_argument("--buckets", default="1,8,32,128")
    sp.add_argument("--max-wait-ms", type=float, default=2.0)
    sp.add_argument("--data-parallel", type=int, default=1,
                    help="shard batches over this many devices (-1 = all)")
    sp.add_argument("--wire", default="f32", choices=["f32", "u8"],
                    help="request wire format: u8 = raw uint8 payloads "
                         "normalized on device (4x less transfer/request — "
                         "the 224px deployment config)")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("experiment")
    common(sp)
    sp.add_argument("--epochs", type=int, default=20)
    sp.add_argument("--lr", type=float, default=0.1)
    sp.add_argument("--optimizer", default="sgd_cosine",
                    choices=["sgd_cosine", "adam_plateau"])
    sp.add_argument("--skip-training", action="store_true")
    sp.add_argument("--qat-epochs", type=int, default=2,
                    help="QAT finetune epochs after PTQ (0 disables; the qat "
                         "artifact then joins evaluate/bench/report)")
    sp.add_argument("--observer", default="minmax")
    sp.add_argument("--calibration-batches", type=int, default=16)
    sp.add_argument("--adaround-steps", type=int, default=0,
                    help="learned-rounding refinement steps for the sub-byte "
                         "tiers (see quantize --adaround-steps)")
    sp.add_argument("--int4-guard", type=float, default=0.0,
                    help="sub-byte tiers: keep 8-bit weights at layers whose "
                         "measured int4 damage exceeds this multiple of the "
                         "median (0 disables; 50 catches the early-layer "
                         "outliers on resnet at 224px - docs/PERF.md)")
    sp.add_argument("--skip-first-layer", action="store_true",
                    help="static scheme: fp32 stem with int8 handoff out")
    sp.add_argument("--pre-add-quant", action="store_true",
                    help="static scheme: quantize residual operands before "
                         "the add in downsample blocks (reference residual "
                         "semantics; bandwidth win on TPU)")
    sp.add_argument("--eval-batch-size", type=int, default=512)
    sp.add_argument("--batch-sizes", default="1,32,1024")
    sp.add_argument("--warmup", type=int, default=10)
    sp.add_argument("--iters", type=int, default=100)
    sp.add_argument("--report-batch-size", type=int, default=32)
    _train_recipe_args(sp)
    sp.set_defaults(fn=cmd_experiment)
    return p


def _resolve_defaults(args):
    """Dataset-dependent defaults, mirroring the reference's two tracks:
    SimpleConvNet+CIFAR-10 (main.py) and ResNet-50+ImageNet-val
    (models/dynamic_ptq_model.py ResNet family)."""
    imagenet = getattr(args, "dataset", "cifar10") == "imagenet"
    if args.model is None:
        args.model = "resnet50" if imagenet else "simple_convnet"
    if args.image_size is None:
        args.image_size = 224 if imagenet else 32
    if args.num_classes is None:
        args.num_classes = 1000 if imagenet else 10


def main(argv=None):
    import sys as _sys

    argv = list(_sys.argv[1:]) if argv is None else list(argv)
    parser = build_parser()
    # --config file.json seeds defaults; explicit flags still win (the one
    # dataclass-config story of SURVEY.md section 5, layered under argparse).
    if "--config" in argv:
        cfg_path = argv[argv.index("--config") + 1]
        with open(cfg_path) as f:
            defaults = json.load(f)
        for sub_action in parser._subparsers._group_actions:
            for sp in sub_action.choices.values():
                known = {a.dest for a in sp._actions}
                sp.set_defaults(**{k: v for k, v in defaults.items() if k in known})
    args = parser.parse_args(argv)
    _resolve_defaults(args)
    args.fn(args)


if __name__ == "__main__":
    main()
