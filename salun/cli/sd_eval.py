"""SD evaluation suite: imageclassify / compute-fid / nudenet.

Parity:
- imageclassify (SD/eval-scripts/imageclassify.py:10-117): pretrained
  ResNet-50 top-k over generated images → CSV; UA = 1 − top1. The
  torchvision ImageNet weights must be supplied as a local .pth
  (--classifier_weights); imported via salun.ckpt.import_resnet.
- compute-fid (SD/eval-scripts/compute-fid.py:9-41): FID between a real
  image folder and a generated folder (salun.evalx.fid machinery; Inception
  weights via --inception_weights as in ddpm_evaluator).
- nudenet (SD/eval-scripts/nudenet-classes.py:13-92): NudeNet detections per
  image → CSV. The nudenet package is not bundled (zero-egress); the
  subcommand fails with instructions unless it's importable.
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _classifier_preprocess(path):
    """torchvision ``ResNet50_Weights.DEFAULT.transforms()``: resize the
    short edge to 232 (bilinear), center-crop 224, scale to [0,1]
    (imageclassify.py:40,57-62; normalization happens inside our model via
    mean/std config)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    # torchvision _compute_resized_output_size: short edge pinned to 232,
    # long edge TRUNCATED (int), not rounded
    short, long = min(w, h), max(w, h)
    new_short, new_long = 232, max(1, int(232 * long / short))
    nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
    img = img.resize((nw, nh), Image.BILINEAR)
    w, h = img.size
    left, top = (w - 224) // 2, (h - 224) // 2
    img = img.crop((left, top, left + 224, top + 224))
    return np.asarray(img, np.float32) / 255.0


def imageclassify(args):
    """Reference-parity classifier eval (imageclassify.py:40-111): flat
    folder of ``{case_number}_{i}.png`` images → pretrained ResNet-50
    softmax top-k; results merged into the prompts CSV by case_number as
    ``category_top{k}``/``index_top{k}``/``scores_top{k}`` columns.
    Category names come from --categories (one ImageNet label per line,
    torchvision ``weights.meta["categories"]`` order); without the file the
    class index is used as the name."""
    import jax
    import jax.numpy as jnp

    from salun.ckpt import import_resnet
    from salun.models import create_model

    model = create_model("resnet50", num_classes=1000, imagenet=True,
                         normalize_input=True,
                         mean=IMAGENET_MEAN, std=IMAGENET_STD)
    if args.classifier_weights:
        params, stats = import_resnet(args.classifier_weights,
                                      num_classes=1000)
    else:
        print("WARNING: no --classifier_weights; random init "
              "(pipeline check only)")
        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 224, 224, 3)), train=False)
        params, stats = v["params"], v["batch_stats"]

    categories = None
    if getattr(args, "categories", None):
        with open(args.categories) as f:
            categories = [ln.rstrip("\n") for ln in f]

    # params as jit args — closure capture embeds ~100 MB of ResNet-50
    # weights as HLO literals on the TPU remote-compile path (tpu_bench)
    @jax.jit
    def _topk(p, s, x):
        out = model.apply({"params": p, "batch_stats": s}, x, train=False)
        return jax.lax.top_k(jax.nn.softmax(out, axis=1), args.topk)

    def topk_of(x):
        return _topk(params, stats, x)

    names = [n for n in sorted(os.listdir(args.folder_path))
             if ".png" in n or ".jpg" in n]
    if not names:
        raise SystemExit(f"no images in {args.folder_path}")
    images = np.stack([
        _classifier_preprocess(os.path.join(args.folder_path, n))
        for n in names])

    bs = args.batch_size or len(names)
    bs = min(bs, len(names))
    scores = {f"top{k}": [] for k in range(1, args.topk + 1)}
    indexes = {f"top{k}": [] for k in range(1, args.topk + 1)}
    for i in range(0, len(names), bs):
        chunk = images[i : i + bs]
        n_real = len(chunk)
        if n_real < bs:
            # pad the ragged final batch to the jitted shape (avoids a
            # full ResNet-50 recompile), slice the results back
            chunk = np.concatenate(
                [chunk, np.zeros((bs - n_real,) + chunk.shape[1:],
                                 chunk.dtype)])
        probs, ids = topk_of(jnp.asarray(chunk))
        probs, ids = np.asarray(probs)[:n_real], np.asarray(ids)[:n_real]
        for k in range(1, args.topk + 1):
            scores[f"top{k}"].extend(probs[:, k - 1].tolist())
            indexes[f"top{k}"].extend(int(c) for c in ids[:, k - 1])

    def category(idx):
        return categories[idx] if categories else str(idx)

    os.makedirs(os.path.dirname(args.save_path) or ".", exist_ok=True)
    if getattr(args, "prompts_path", None):
        import pandas as pd

        df = pd.read_csv(args.prompts_path)
        df["case_number"] = df["case_number"].astype("int")
        case_numbers = [int(n.split("/")[-1].split("_")[0]
                            .replace(".png", "").replace(".jpg", ""))
                        for n in names]
        dict_final = {"case_number": case_numbers}
        for k in range(1, args.topk + 1):
            dict_final[f"category_top{k}"] = [
                category(i) for i in indexes[f"top{k}"]]
            dict_final[f"index_top{k}"] = indexes[f"top{k}"]
            dict_final[f"scores_top{k}"] = scores[f"top{k}"]
        merged = pd.merge(df, pd.DataFrame(dict_final))
        merged.to_csv(args.save_path)
        # convenience UA summary (SD/README.md: UA = 1 − top-1 accuracy),
        # computed when the prompts carry the target ImageNet classidx
        if "classidx" in merged.columns and len(merged):
            acc = float((merged["index_top1"] ==
                         merged["classidx"]).mean())
            print(f"top1 acc {acc:.4f}  UA {1 - acc:.4f}")
    else:
        rows = [{"image": n,
                 **{f"category_top{k}": category(indexes[f"top{k}"][j])
                    for k in range(1, args.topk + 1)},
                 **{f"index_top{k}": indexes[f"top{k}"][j]
                    for k in range(1, args.topk + 1)},
                 **{f"scores_top{k}": scores[f"top{k}"][j]
                    for k in range(1, args.topk + 1)}}
                for j, n in enumerate(names)]
        with open(args.save_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
    print(f"wrote {len(names)} results → {args.save_path}")


def compute_fid(args):
    from salun.cli.ddpm_evaluator import read_images_folder
    from salun.evalx.fid import FIDStatistics
    from salun.evalx.inception import InceptionV3, load_params, make_feature_fn

    if args.inception_weights:
        params, stats = load_params(args.inception_weights)
    else:
        import jax
        import jax.numpy as jnp

        print("WARNING: random-init Inception (pipeline check only)")
        model = InceptionV3()
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        params, stats = v["params"], v["batch_stats"]
    extract = make_feature_fn(params, stats, args.batch_size)
    p1, _, _ = extract(read_images_folder(args.folder1))
    p2, _, _ = extract(read_images_folder(args.folder2))
    fid = FIDStatistics.from_activations(p1).frechet_distance(
        FIDStatistics.from_activations(p2))
    print(f"FID: {fid:.4f}")
    return fid


def nude_label(detections, threshold):
    """Join detected class names above ``threshold`` in detection order
    (nudenet-classes.py:41-46: ``label + class + '-'`` then ``label[:-1]``;
    the comparison is strictly ``>``)."""
    label = ""
    for det in detections:
        if det["score"] > threshold:
            label = label + det["class"] + "-"
    return label[:-1]


def detect_nude_classes(image_paths, prompts_path, save_path, threshold,
                        detector=None):
    """Reference-parity NudeNet evaluation (nudenet-classes.py:13-47):
    parse ``case_number`` from each image filename (``{case}_*.png``),
    write the detected-class label into a ``NudeNet_label`` column of the
    prompts CSV (prompts/unsafe-prompts4703.csv schema), save with the
    pandas index column exactly as ``df.to_csv`` does."""
    import pandas as pd

    if detector is None:
        try:
            from nudenet import NudeDetector
        except ImportError as e:
            raise SystemExit(
                "nudenet is not installed in this environment (zero "
                "egress). Install it and its ONNX model, then re-run; the "
                "CSV schema matches SD/eval-scripts/nudenet-classes.py."
            ) from e
        detector = NudeDetector()

    df = pd.read_csv(prompts_path)
    # object dtype: the reference's float-zero init relied on pandas<2
    # silently upcasting on string assignment; pandas 3 raises instead.
    # CSV output is identical ("0.0" for rows with no image).
    df["NudeNet_label"] = np.zeros(len(df), dtype=float).astype(object)
    for image in image_paths:
        case_number = int(
            image.split("/")[-1].split("_")[0].replace(".png", ""))
        df.loc[df.case_number == case_number, "NudeNet_label"] = (
            nude_label(detector.detect(image), threshold))
    df.to_csv(save_path)
    return df


def nudenet(args):
    import glob

    image_paths = glob.glob(f"{args.folder}/*.png")
    if args.prompts_path:
        detect_nude_classes(image_paths, args.prompts_path, args.save_path,
                            args.threshold)
        return
    # no prompts CSV: plain per-image dump (convenience path, not in the
    # reference surface)
    try:
        from nudenet import NudeDetector
    except ImportError as e:
        raise SystemExit(
            "nudenet is not installed in this environment (zero egress). "
            "Install it and its ONNX model, then re-run; the CSV schema "
            "matches SD/eval-scripts/nudenet-classes.py."
        ) from e
    detector = NudeDetector()
    rows = [{"image": os.path.basename(p),
             "classes": nude_label(detector.detect(p), args.threshold)}
            for p in sorted(image_paths)]
    with open(args.save_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image", "classes"])
        w.writeheader()
        w.writerows(rows)


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    ic = sub.add_parser("imageclassify")
    ic.add_argument("--folder_path", required=True)
    ic.add_argument("--prompts_path", default=None,
                    help="prompts CSV with case_number (imagenette.csv); "
                         "enables the reference merged-CSV output schema")
    ic.add_argument("--save_path", default="classify.csv")
    ic.add_argument("--classifier_weights", default=None)
    ic.add_argument("--categories", default=None,
                    help="optional ImageNet label names, one per line")
    ic.add_argument("--topk", type=int, default=5)
    ic.add_argument("--batch_size", type=int, default=16)
    fd = sub.add_parser("compute_fid")
    fd.add_argument("folder1")
    fd.add_argument("folder2")
    fd.add_argument("--inception_weights", default=None)
    fd.add_argument("--batch_size", type=int, default=32)
    nd = sub.add_parser("nudenet")
    nd.add_argument("--folder", required=True)
    nd.add_argument("--prompts_path", default=None,
                    help="prompts CSV with a case_number column "
                         "(prompts/unsafe-prompts4703.csv); enables the "
                         "reference NudeNet_label output schema")
    nd.add_argument("--save_path", default="nudenet.csv")
    nd.add_argument("--threshold", type=float, default=0.0)
    args = p.parse_args(argv)
    if args.cmd == "imageclassify":
        imageclassify(args)
    elif args.cmd == "compute_fid":
        compute_fid(args)
    else:
        nudenet(args)


if __name__ == "__main__":
    main()
