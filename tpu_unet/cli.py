"""Command-line entry points.

The reference is script-driven with in-file constants and no CLI
(SURVEY.md §5.6); here the same workflows are subcommands over the preset
tables:

    python -m tpu_unet.cli train  --preset medical --data-root /data ...
    python -m tpu_unet.cli predict --preset ultralight_large_optimized \
        --model-path ckpt.pth --mode dir --input img/ --output out/
    python -m tpu_unet.cli miou  --preset ... --model-path ... --split val.txt
    python -m tpu_unet.cli summary --model unet_vgg --size 512
    python -m tpu_unet.cli export --preset ... --model-path ... --out m.stablehlo
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def _add_common(p):
    p.add_argument("--model-path", default="")
    p.add_argument("--num-classes", type=int)
    p.add_argument("--input-shape", type=int, nargs=2)


def cmd_train(args):
    from tpu_unet.configs.presets import get_preset
    from tpu_unet.core.distributed import initialize
    from tpu_unet.data.datasets import read_split
    from tpu_unet.train.fit import fit

    # multi-host init (no-op single-process; reference: train.py:254-266)
    initialize()

    overrides = {}
    if args.model_path:
        overrides["model_path"] = args.model_path
    if args.num_classes:
        overrides["num_classes"] = args.num_classes
    if args.input_shape:
        overrides["input_shape"] = tuple(args.input_shape)
    if args.epochs:
        overrides["unfreeze_epoch"] = args.epochs
    if args.batch_size:
        overrides["freeze_batch_size"] = args.batch_size
        overrides["unfreeze_batch_size"] = args.batch_size
    if args.data_path:
        overrides["dataset_path"] = args.data_path
    if args.eval_period:
        # an explicit period is a request for eval, even on presets that
        # default it off (e.g. medical mirrors train_medical.py's no-val)
        overrides["eval_period"] = args.eval_period
        overrides["eval_flag"] = True
    if args.save_dir:
        overrides["save_dir"] = args.save_dir
    if args.no_pretrained:
        overrides["pretrained_backbone"] = False
    cfg = get_preset(args.preset, **overrides)

    if args.train_split:
        train_ids = read_split(args.train_split)
        val_ids = read_split(args.val_split) if args.val_split else []
    else:
        # default split layouts: VOC-style under <data>/VOC2012 (reference:
        # train.py:355-358), medical directly under the dataset root
        # (train_medical.py:227-230), defect under <data>/DataB
        sub = {"voc": "VOC2012", "heavy": "VOC2012", "voc2007": "VOC2007",
               "defect": "DataB", "medical": ""}[cfg.dataset]
        sets = os.path.join(args.data_root, cfg.dataset_path, sub,
                            "ImageSets", "Segmentation")
        train_ids = read_split(os.path.join(sets, "train.txt"))
        val_path = os.path.join(sets, "val.txt")
        val_ids = read_split(val_path) if os.path.exists(val_path) else []

    if args.dry_run:
        # layout audit only — validates the dataset BEFORE the long run
        # (the RUNBOOK_VOC.md pre-flight step)
        import json

        from tpu_unet.data.datasets import validate_layout
        from tpu_unet.train.fit import DATASETS

        root = cfg.dataset_path if os.path.isabs(cfg.dataset_path) \
            else os.path.join(args.data_root, cfg.dataset_path)
        report = validate_layout(DATASETS[cfg.dataset], root,
                                 train_ids, val_ids, cfg.num_classes)
        print(json.dumps(report, indent=2))
        for w in report["warnings"]:
            print(f"WARNING: {w}")
        print("dry-run OK — dataset layout is usable; re-run without "
              "--dry-run to train")
        return

    wandb_logger = None
    if args.wandb:
        from tpu_unet.train.wandb_logging import WandbLogger

        wandb_logger = WandbLogger(project=args.wandb_project,
                                   config=dataclasses.asdict(cfg))

    # eval-during-training is default-on like the reference (train.py:445)
    fit(cfg, train_ids, val_ids, base_dir=args.data_root,
        wandb_logger=wandb_logger, auto_eval_callback=not args.no_eval)


def _wrapper_overrides(args):
    over = {"model_path": args.model_path}
    if args.num_classes:
        over["num_classes"] = args.num_classes
    if args.input_shape:
        over["input_shape"] = list(args.input_shape)
    return over


def cmd_predict(args):
    from PIL import Image

    from tpu_unet.configs.infer_presets import build_wrapper
    from tpu_unet.tools import predict as P

    u = build_wrapper(args.preset, **_wrapper_overrides(args),
                      **({"mix_type": args.mix_type}
                         if args.mix_type is not None else {}))
    if args.mode == "dir":
        n = P.predict_dir(u, args.input, args.output, save_npy=args.save_npy)
        print(f"processed {n} images -> {args.output}")
    elif args.mode == "dir_batched":
        n = P.predict_dir_batched(u, args.input, args.output,
                                  batch_size=args.batch_size)
        print(f"processed {n} images -> {args.output}")
    elif args.mode == "single":
        out_path = args.output
        if not os.path.splitext(out_path)[1]:
            out_path += ".jpg"  # PIL needs an extension to pick a format
        out = u.detect_image(Image.open(args.input), count=args.count)
        out.save(out_path)
        print(f"saved {out_path}")
    elif args.mode == "video":
        # a numeric --input selects a camera index (reference: predict.py:118)
        src = int(args.input) if args.input.isdigit() else args.input
        frames, fps = P.predict_video(u, src, args.output)
        print(f"{frames} frames, {fps:.1f} fps")
    elif args.mode == "fps":
        P.fps_test(u, args.input, args.test_interval)


def cmd_miou(args):
    from tpu_unet.configs.infer_presets import build_wrapper
    from tpu_unet.data.datasets import read_split
    from tpu_unet.eval.driver import evaluate

    u = build_wrapper(args.preset, **_wrapper_overrides(args))
    ids = read_split(args.split)
    evaluate(u, ids, args.gt_dir, u.num_classes,
             name_classes=args.names.split(",") if args.names else None,
             image_dir=args.image_dir, pred_dir=args.pred_dir)


def cmd_fold(args):
    """RepVGG reparameterization fold — the switch_to_deploy counterpart
    (reference: RepVGG_Unet.py:203-207): training checkpoint in, deploy-mode
    (single-3x3-conv) checkpoint out."""
    from tpu_unet.models.repvgg import fold_repvgg
    from tpu_unet.train.checkpoint import load_any, save_variables

    variables = load_any(args.model_path, args.model)
    variables = {k: v for k, v in variables.items()
                 if k in ("params", "batch_stats")}  # drop full-state extras
    folded = fold_repvgg(variables)
    save_variables(args.out, folded)
    print(f"folded {args.model_path} -> {args.out} "
          f"(load with build_model({args.model!r}, ..., deploy=True))")


def cmd_summary(args):
    from tpu_unet.tools.summary import summarize

    summarize(args.model, (args.size, args.size), args.num_classes or 21)


def cmd_export(args):
    from tpu_unet.configs.infer_presets import build_wrapper

    u = build_wrapper(args.preset, **_wrapper_overrides(args))
    u.convert_to_export(args.out)


def main(argv=None):
    from tpu_unet.core.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser(prog="tpu_unet")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train")
    p.add_argument("--preset", required=True)
    p.add_argument("--data-root", default=".")
    p.add_argument("--data-path", default="")
    p.add_argument("--train-split", default="")
    p.add_argument("--val-split", default="")
    p.add_argument("--epochs", type=int)
    p.add_argument("--batch-size", type=int)
    p.add_argument("--eval-period", type=int,
                   help="epochs between val-mIoU evals (preset default)")
    p.add_argument("--no-eval", action="store_true",
                   help="disable eval-during-training (default on, like "
                        "the reference EvalCallback)")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--wandb-project", default="tpu-unet")
    p.add_argument("--save-dir", default="")
    p.add_argument("--no-pretrained", action="store_true",
                   help="train the backbone from random init even when the "
                        "preset asks for ImageNet weights")
    p.add_argument("--dry-run", action="store_true",
                   help="validate the dataset layout + splits and exit "
                        "without training (the runbook pre-flight)")
    _add_common(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("predict")
    p.add_argument("--preset", required=True)
    p.add_argument("--mode", default="dir",
                   choices=["dir", "dir_batched", "single", "video", "fps"])
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--input", required=True)
    p.add_argument("--output", default="out")
    p.add_argument("--mix-type", type=int, default=None)
    p.add_argument("--count", action="store_true")
    p.add_argument("--save-npy", action="store_true")
    p.add_argument("--test-interval", type=int, default=100)
    _add_common(p)
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("miou")
    p.add_argument("--preset", required=True)
    p.add_argument("--split", required=True)
    p.add_argument("--image-dir", required=True)
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--pred-dir", default="")
    p.add_argument("--names", default="")
    _add_common(p)
    p.set_defaults(fn=cmd_miou)

    p = sub.add_parser("fold")
    p.add_argument("--model", default="repvgg_segnet")
    p.add_argument("--model-path", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_fold)

    p = sub.add_parser("summary")
    p.add_argument("--model", required=True)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--num-classes", type=int)
    p.set_defaults(fn=cmd_summary)

    p = sub.add_parser("export")
    p.add_argument("--preset", required=True)
    p.add_argument("--out", required=True)
    _add_common(p)
    p.set_defaults(fn=cmd_export)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
