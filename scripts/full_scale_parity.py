"""Full-scale model + checkpoint-load parity vs the reference torch code.

The released ``MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth`` is not
available in this environment (zero egress; /root/reference/checkpoints is
empty), so this script validates the *entire* released-checkpoint path at
full production scale with a randomly-initialized full-size reference model:

  1. builds the FULL-SIZE reference AsymmetricMASt3R (ViT-L 24x1024x16 enc,
     dual 12x768 dec, catmlp+dpt head) with the reference code at
     /root/reference (torch, CPU);
  2. saves it in the exact released checkpoint format
     ({'args': Namespace(model="AsymmetricMASt3R(...ManyAR_PatchEmbed...)"),
       'model': state_dict}) — spec: mast3r/model.py:21-37;
  3. loads it through our ``convert.load_released_checkpoint`` (the
     from_pretrained equivalent, incl. args-string parsing);
  4. compares encoder / decoder-final / head outputs at the production
     512x384 resolution in fp32 (JAX on CPU so arithmetic matches);
  5. re-runs our side with the production bf16 trunk + fp32 head and
     records the drift — this number is the tolerance the real checkpoint
     would see on TPU.

Writes a markdown results table to PARITY.md (and prints it).

Usage:  PYTHONPATH=/root/repo python scripts/full_scale_parity.py
        (takes several minutes on a 2-CPU host; run in background)
"""

import argparse
import os
import pathlib
import sys
import tempfile
import time
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
REF = pathlib.Path("/root/reference")
sys.path.insert(0, str(REPO))

# The exact released instantiation string (thirdparty/mast3r/README.md:277)
# including the ManyAR_PatchEmbed + absent landscape_only that load_model
# rewrites — so the parsing path is exercised end-to-end.
RELEASED_ARGS = (
    "AsymmetricMASt3R(pos_embed='RoPE100', patch_embed_cls='ManyAR_PatchEmbed',"
    " img_size=(512, 512), head_type='catmlp+dpt', output_mode='pts3d+desc24',"
    " depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf), enc_embed_dim=1024,"
    " enc_depth=24, enc_num_heads=16, dec_embed_dim=768, dec_depth=12,"
    " dec_num_heads=12, two_confs=True, desc_conf_mode=('exp', 0, inf))"
)

H, W = 384, 512


def build_torch_model():
    import torch

    for p in [REF / "thirdparty/mast3r", REF / "thirdparty/mast3r/dust3r",
              REF / "thirdparty/mast3r/dust3r/croco"]:
        sys.path.insert(0, str(p))
    from mast3r.model import AsymmetricMASt3R  # noqa

    inf = float("inf")
    torch.manual_seed(0)
    # Instantiate exactly as load_model would after its rewrites
    # (ManyAR -> PatchEmbedDust3R, landscape_only=False).
    model = AsymmetricMASt3R(
        pos_embed="RoPE100", patch_embed_cls="PatchEmbedDust3R",
        img_size=(512, 512), head_type="catmlp+dpt",
        output_mode="pts3d+desc24", depth_mode=("exp", -inf, inf),
        conf_mode=("exp", 1, inf), enc_embed_dim=1024, enc_depth=24,
        enc_num_heads=16, dec_embed_dim=768, dec_depth=12, dec_num_heads=12,
        two_confs=True, desc_conf_mode=("exp", 0, inf), landscape_only=False,
    )
    model.eval()
    return model


def save_released_format(model, path):
    import torch

    args = types.SimpleNamespace(model=RELEASED_ARGS)
    torch.save({"args": args, "model": model.state_dict()}, path)


def torch_forward(model, imgs):
    import torch

    timg = torch.from_numpy(imgs).permute(0, 3, 1, 2)
    shape = torch.tensor([[H, W]] * imgs.shape[0], dtype=torch.int32)
    with torch.no_grad():
        f1, p1, _ = model._encode_image(timg[:1], shape[:1])
        f2, p2, _ = model._encode_image(timg[1:], shape[1:])
        dec1, dec2 = model._decoder(f1, p1, f2, p2)
        res1 = model._downstream_head(1, [t.float() for t in dec1], shape[:1])
        res2 = model._downstream_head(2, [t.float() for t in dec2], shape[1:])
    return (f1.numpy(), f2.numpy()), (res1, res2)


def jax_forward(params, imgs, cfg):
    from mast3r_slam_tpu.models import mast3r

    feat, pos = mast3r.encode(params, imgs, cfg)
    res1, res2 = mast3r.decode_pair(
        params, feat[:1], pos[:1], feat[1:], pos[1:], cfg)
    return feat, (res1, res2)


def errs(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    d = np.abs(a - b)
    scale = max(np.abs(b).max(), 1e-12)
    return d.max(), d.mean(), d.max() / scale


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "PARITY.md"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    t0 = time.time()
    print("building full-size torch reference model ...", flush=True)
    model = build_torch_model()
    nparams = sum(p.numel() for p in model.parameters())
    print(f"  {nparams/1e6:.1f} M params  [{time.time()-t0:.0f}s]", flush=True)

    with tempfile.TemporaryDirectory() as td:
        ckpt_path = os.path.join(td, "fake_released.pth")
        save_released_format(model, ckpt_path)
        print("saved released-format checkpoint, loading via "
              "convert.load_released_checkpoint ...", flush=True)
        from mast3r_slam_tpu.models import convert

        cfg32, params32 = convert.load_released_checkpoint(
            ckpt_path, img_size=(H, W), dtype="float32")
    assert cfg32.enc_depth == 24 and cfg32.enc_embed_dim == 1024
    assert cfg32.dec_depth == 12 and cfg32.dec_embed_dim == 768
    assert cfg32.desc_dim == 24 and cfg32.rope_base == 100.0
    print(f"  parsed config OK  [{time.time()-t0:.0f}s]", flush=True)

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, H, W, 3)).astype(np.float32) * 0.5

    print("torch forward (fp32, CPU) ...", flush=True)
    (tf1, tf2), (tres1, tres2) = torch_forward(model, imgs)
    print(f"  done [{time.time()-t0:.0f}s]", flush=True)

    rows = []

    def compare(tag, jres, tres):
        for k, tk in [("pts3d", "pts3d"), ("conf", "conf"),
                      ("desc", "desc"), ("desc_conf", "desc_conf")]:
            mx, mn, rel = errs(jres[k], tres[tk].numpy())
            rows.append((tag, k, mx, mn, rel))

    print("jax forward (fp32, CPU) ...", flush=True)
    jfeat, (jres1, jres2) = jax_forward(params32, imgs, cfg32)
    mx, mn, rel = errs(jfeat, np.concatenate([tf1, tf2], 0))
    rows.append(("fp32", "enc_feat", mx, mn, rel))
    compare("fp32/head1", jres1, tres1)
    compare("fp32/head2", jres2, tres2)
    print(f"  done [{time.time()-t0:.0f}s]", flush=True)

    print("jax forward (bf16 trunk + fp32 head — production config) ...",
          flush=True)
    cfg16 = cfg32._replace(dtype="bfloat16")
    _, (bres1, bres2) = jax_forward(params32, imgs, cfg16)
    compare("bf16/head1", bres1, tres1)
    compare("bf16/head2", bres2, tres2)
    print(f"  done [{time.time()-t0:.0f}s]", flush=True)

    lines = [
        "# PARITY — full-scale model + checkpoint-load parity",
        "",
        "Full-size (ViT-L 24x1024x16 enc / dual 12x768 dec / catmlp+dpt "
        "head, 512x384, 768 tokens) randomly-initialized *reference* torch "
        "model, saved in the released checkpoint format and loaded through "
        "`convert.load_released_checkpoint` (the from_pretrained "
        "equivalent). The released .pth itself is unreachable in this "
        "environment (zero egress) — this pins the converter + architecture "
        "at production scale so loading the real file is mechanical.",
        "",
        f"Model: {nparams/1e6:.1f} M params. Generated by "
        "`scripts/full_scale_parity.py` (torch fp32 CPU vs JAX CPU).",
        "",
        "| config | output | max abs err | mean abs err | max rel (vs max|ref|) |",
        "|---|---|---|---|---|",
    ]
    for tag, k, mx, mn, rel in rows:
        lines.append(f"| {tag} | {k} | {mx:.3e} | {mn:.3e} | {rel:.3e} |")
    lines += [
        "",
        "fp32 rows validate architecture + converter (target: ~1e-4 level, "
        "pure reassociation noise). bf16 rows are the production "
        "trunk-precision drift and define the expected tolerance vs the "
        "reference when the real checkpoint runs on TPU.",
        "",
    ]
    out = "\n".join(lines)
    pathlib.Path(args.out).write_text(out)
    print(out)
    print(f"total {time.time()-t0:.0f}s; wrote {args.out}")


if __name__ == "__main__":
    main()
