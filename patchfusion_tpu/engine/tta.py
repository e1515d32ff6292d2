"""ZoeDepth inference-time augmentation (reference external/zoedepth/models/
depth_model.py:47-152): reflect-pad the input (pad = sqrt(dim/2)*3), run,
bicubic-resize back and crop; optionally average with the horizontally
flipped pass. Plus `infer_pil` convenience."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from patchfusion_tpu.ops.resize import interpolate


def zoe_infer(apply_fn, x, pad_input: bool = True,
              with_flip_aug: bool = True, fh: float = 3.0, fw: float = 3.0,
              multiple_of: int = 14):
    """apply_fn: (B,H,W,3) -> dict with 'metric_depth' (B,H,W,1).
    x: (B,H,W,3). Returns (B,H,W,1).

    The reference pads arbitrarily and relies on the core's internal Resize
    (PrepForMidas, do_resize=True) to reach a multiple-of-14 size; our
    branch has no internal resize, so the padded input is resized here with
    the same 'minimal multiple-of' rule before the forward pass."""
    from patchfusion_tpu.ops.resize import minimal_multiple_resize_size

    def infer_pad(xx):
        h, w = xx.shape[1:3]
        if pad_input:
            pad_h = int(np.sqrt(h / 2) * fh)
            pad_w = int(np.sqrt(w / 2) * fw)
            pads = [(0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)]
            xx = jnp.pad(xx, pads, mode="reflect")
        ph, pw = xx.shape[1:3]
        nh, nw = minimal_multiple_resize_size(ph, pw, ph, pw, multiple_of)
        net_in = xx if (nh, nw) == (ph, pw) else interpolate(
            xx, (nh, nw), mode="bilinear", align_corners=True)
        out = apply_fn(net_in)["metric_depth"]
        if out.shape[1:3] != (ph, pw):
            out = interpolate(out, (ph, pw), mode="bicubic",
                              align_corners=False)
        if pad_input:
            if pad_h > 0:
                out = out[:, pad_h:-pad_h]
            if pad_w > 0:
                out = out[:, :, pad_w:-pad_w]
        return out

    out = infer_pad(x)
    if with_flip_aug:
        out_flip = infer_pad(x[:, :, ::-1])
        out = (out + out_flip[:, :, ::-1]) / 2.0
    return out


def infer_pil(apply_fn, pil_img, pad_input: bool = True,
              with_flip_aug: bool = True, output_type: str = "numpy"):
    """PIL image convenience wrapper (depth_model.py:135-152)."""
    x = np.asarray(pil_img, np.float32)[None] / 255.0
    out = np.asarray(zoe_infer(apply_fn, x, pad_input, with_flip_aug))
    out = out.squeeze()
    if output_type == "numpy":
        return out
    if output_type == "pil":
        from PIL import Image
        return Image.fromarray((out * 256).astype(np.uint16))
    if output_type == "tensor":
        return jnp.asarray(out)
    raise ValueError(f"output_type {output_type} not supported")
