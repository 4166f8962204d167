"""Classic CNN-CAM demo (t.py:1-130 parity).

The reference hooks the last conv block of a torchvision CNN — squeezenet1_1
(model_id 1), resnet18 (2) or densenet161 (3), t.py:25-33 — dots the feature
maps with the classifier weights of the top-5 softmax classes and writes
JET-overlay jpgs.  Same flow here with the JAX CNNs (`--arch` selects among
models/{resnet,squeezenet,densenet}.py, each of which returns the hooked
feature tensor alongside the logits — the functional answer to a forward
hook).  Weights load from an .npz pytree (no torchvision download in this
environment — random weights demonstrate the pipeline).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from vision_transformer_cam_tpu.cam.render import overlay_cam
from vision_transformer_cam_tpu.data.transforms import preprocess_array
from vision_transformer_cam_tpu.models import densenet, resnet, squeezenet

# t.py:25-33's model_id table, keyed by the torchvision factory names
ARCHS = {"resnet18": resnet, "squeezenet1_1": squeezenet,
         "densenet161": densenet}


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", type=str, required=True)
    p.add_argument("--arch", type=str, default="resnet18",
                   choices=sorted(ARCHS),
                   help="CNN architecture (t.py:25-33's model_id table)")
    p.add_argument("--weights", type=str, default="",
                   help=".npz CNN pytree; empty = random init")
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--labels_json", type=str, default="",
                   help="JSON array of class names (the reference's "
                        "imagenet-simple-labels.json, t.py:19,95-104); "
                        "empty = print bare class indices")
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--out", type=str, default="./cnn_cam")
    return p


def main(argv=None):
    from vision_transformer_cam_tpu.utils import honor_jax_platforms_env
    honor_jax_platforms_env()
    args = build_parser().parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    arch = ARCHS[args.arch]
    if args.weights:
        from vision_transformer_cam_tpu.io.weights import load_npz
        params = load_npz(args.weights)
    else:
        params = arch.init(jax.random.key(0), num_classes=args.num_classes)

    import PIL.Image
    pil = PIL.Image.open(args.image).convert("RGB")
    img_bgr = np.asarray(pil)[..., ::-1]
    x = preprocess_array(np.asarray(pil), 224, (0.485, 0.456, 0.406),
                         (0.229, 0.224, 0.225))
    logits, feats = arch.apply(params, x[None])
    probs = np.asarray(jax.nn.softmax(logits[0]))
    top = np.argsort(-probs)[:args.topk]
    names = None
    if args.labels_json:
        import json
        with open(args.labels_json) as f:
            names = json.load(f)
        for c in top:  # '{prob:.3f} -> {name}' lines (t.py:102-104)
            print(f"{probs[c]:.3f} -> {names[int(c)]}")
    else:
        print("top classes:", [(int(c), float(probs[c])) for c in top])

    cams = resnet.return_cam(np.asarray(feats[0]),
                             np.asarray(arch.cam_weight(params)), top)
    name = os.path.splitext(os.path.basename(args.image))[0]
    for rank, (c, cam) in enumerate(zip(top, cams)):
        out = overlay_cam(cam, img_bgr)
        path = os.path.join(args.out, f"{name}_cam_top{rank}_cls{int(c)}.jpg")
        from vision_transformer_cam_tpu.cam.render import _imwrite
        _imwrite(path, out)
        print("saved", path)
    return {"top": top, "probs": probs, "cams": cams, "names": names}


if __name__ == "__main__":
    main()
