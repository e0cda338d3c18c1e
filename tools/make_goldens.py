"""Generate reference-parity golden arrays by EXECUTING the reference
implementation (PyTorch, CPU) and saving its outputs.

    python tools/make_goldens.py --reference /root/reference \
        --out tests/golden/reference_goldens.npz

The test suite (tests/test_parity.py) consumes only the .npz — the
reference checkout is needed only to (re)generate it. Covered sites, each
matching the reference's own `pytest=True` deterministic hooks
(run_nerf.py:373-377, run_nerf_helpers.py:214-223):

  sample_pdf        seeded-u and det inverse-CDF draws
  raw2outputs       compositing maps, black + white background
  render_rays       full coarse→fine tiny render with keras-format weights
                    shared across both implementations
  gauss_net         splat forward image AND the pixel gradient through
                    splat→composite→classifier (GaussNet.py:46-159)
"""

from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np
import torch


def stub_torchvision():
    """model/GaussNet.py imports torchvision.transforms.Resize at module
    scope; we never exercise the resize path (model_name="my_model"), so a
    constructor-only stub suffices."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")

    class Resize:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            raise RuntimeError("resize path not exercised in goldens")

    tr.Resize = Resize
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr


def export_keras_weights(model) -> list:
    """Torch NeRF → the official keras weight-list layout (the inverse of
    NeRF.load_weights_from_keras, run_nerf_helpers.py:125-152)."""
    ws = []
    for l in model.pts_linears:
        ws += [l.weight.data.numpy().T.copy(), l.bias.data.numpy().copy()]
    ws += [model.feature_linear.weight.data.numpy().T.copy(),
           model.feature_linear.bias.data.numpy().copy()]
    ws += [model.views_linears[0].weight.data.numpy().T.copy(),
           model.views_linears[0].bias.data.numpy().copy()]
    ws += [model.rgb_linear.weight.data.numpy().T.copy(),
           model.rgb_linear.bias.data.numpy().copy()]
    ws += [model.alpha_linear.weight.data.numpy().T.copy(),
           model.alpha_linear.bias.data.numpy().copy()]
    return ws


class TinyClassifier(torch.nn.Module):
    """Linear classifier over CHW-flattened 0-255 pixels."""

    def __init__(self, Wc: np.ndarray):
        super().__init__()
        self.Wc = torch.nn.Parameter(
            torch.tensor(Wc, dtype=torch.float), requires_grad=False
        )

    def forward(self, x):                   # x [B, 3, H, W]
        return x.flatten(1) @ self.Wc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "tests", "golden",
            "reference_goldens.npz",
        ),
    )
    args = ap.parse_args()

    sys.path.insert(
        0, os.path.join(args.reference, "Create_spatial_point_set",
                        "nerf_pytorch")
    )
    sys.path.insert(0, args.reference)
    stub_torchvision()
    import run_nerf_helpers as rh
    import run_nerf as rn

    out = {}
    torch.manual_seed(0)

    # ---- 1. sample_pdf (run_nerf_helpers.py:200-243) ----------------------
    bins = (
        np.linspace(2.0, 6.0, 9, dtype=np.float32)[None].repeat(4, 0)
        + np.linspace(0.0, 0.3, 4, dtype=np.float32)[:, None]
    )
    w = ((np.arange(32, dtype=np.float32).reshape(4, 8) % 5.0) + 0.1)
    out["sample_pdf/bins"] = bins
    out["sample_pdf/weights"] = w
    out["sample_pdf/samples"] = rh.sample_pdf(
        torch.tensor(bins), torch.tensor(w), 6, det=False, pytest=True
    ).numpy()
    out["sample_pdf/samples_det"] = rh.sample_pdf(
        torch.tensor(bins), torch.tensor(w), 6, det=True, pytest=True
    ).numpy()

    # ---- 2. raw2outputs (run_nerf.py:262-305) -----------------------------
    rng = np.random.default_rng(1)
    raw = (rng.standard_normal((5, 8, 4)) * 2.0).astype(np.float32)
    z = np.sort(rng.uniform(2.0, 6.0, (5, 8)).astype(np.float32), -1)
    rd = rng.standard_normal((5, 3)).astype(np.float32)
    out["raw2outputs/raw"] = raw
    out["raw2outputs/z_vals"] = z
    out["raw2outputs/rays_d"] = rd
    for wb, tag in ((False, "black"), (True, "white")):
        rgb, disp, acc, weights, depth = rn.raw2outputs(
            torch.tensor(raw), torch.tensor(z), torch.tensor(rd),
            raw_noise_std=0, white_bkgd=wb, pytest=False,
        )
        out[f"raw2outputs/{tag}/rgb"] = rgb.numpy()
        out[f"raw2outputs/{tag}/disp"] = disp.numpy()
        out[f"raw2outputs/{tag}/acc"] = acc.numpy()
        out[f"raw2outputs/{tag}/weights"] = weights.numpy()
        out[f"raw2outputs/{tag}/depth"] = depth.numpy()

    # ---- 3. render_rays coarse→fine (run_nerf.py:308-418) -----------------
    multires, multires_views = 4, 2
    D, W = 2, 32
    embed_fn, input_ch = rh.get_embedder(multires, 0)
    embeddirs_fn, input_ch_views = rh.get_embedder(multires_views, 0)
    model = rh.NeRF(D=D, W=W, input_ch=input_ch, output_ch=5, skips=[0],
                    input_ch_views=input_ch_views, use_viewdirs=True)
    model_fine = rh.NeRF(D=D, W=W, input_ch=input_ch, output_ch=5,
                         skips=[0], input_ch_views=input_ch_views,
                         use_viewdirs=True)
    for i, arr in enumerate(export_keras_weights(model)):
        out[f"render/weights_coarse/{i}"] = arr
    for i, arr in enumerate(export_keras_weights(model_fine)):
        out[f"render/weights_fine/{i}"] = arr

    def network_query_fn(inputs, viewdirs, network_fn):
        return rn.run_network(
            inputs, viewdirs, network_fn,
            embed_fn=embed_fn, embeddirs_fn=embeddirs_fn, netchunk=65536,
        )

    n_rays = 4
    rays_o = np.stack(
        [np.array([0.1 * i - 0.2, 0.05 * i, 4.0], np.float32)
         for i in range(n_rays)]
    )
    theta = np.linspace(-0.25, 0.25, n_rays).astype(np.float32)
    rays_d = np.stack(
        [np.sin(theta), 0.1 * np.cos(theta), -np.cos(theta)], -1
    ).astype(np.float32)
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = 2.0 * np.ones((n_rays, 1), np.float32)
    far = 6.0 * np.ones((n_rays, 1), np.float32)
    ray_batch = torch.tensor(
        np.concatenate([rays_o, rays_d, near, far, viewdirs], -1)
    )
    out["render/rays_o"] = rays_o
    out["render/rays_d"] = rays_d

    ret = rn.render_rays(
        ray_batch, network_fn=model, network_query_fn=network_query_fn,
        N_samples=8, retraw=False, lindisp=False, perturb=1.0,
        N_importance=8, network_fine=model_fine, white_bkgd=True,
        raw_noise_std=0.0, pytest=True,
    )
    for k in ("rgb_map", "disp_map", "acc_map", "rgb0", "disp0", "acc0",
              "z_std"):
        out[f"render/{k}"] = ret[k].detach().numpy()

    # ---- 4. gauss_net splat forward + pixel gradient (GaussNet.py:46-159) -
    from model.GaussNet import gauss_net

    Hh = Ww = 8
    p = 2
    B = 2
    C = 4
    M = p * Hh * Ww
    rng = np.random.default_rng(2)
    spatial = rng.uniform(-80, 80, (p, Hh, Ww, 4)).astype(np.float32)
    spatial[..., 3] = rng.uniform(0, 255, (p, Hh, Ww)).astype(np.float32)
    wgt = rng.uniform(0, 1, (B, Hh, Ww, 8)).astype(np.float32)
    wgt /= wgt.sum(-1, keepdims=True)
    idx = rng.integers(0, M, (B, Hh, Ww, 8)).astype(np.float32)
    ori = rng.uniform(0, 255, (B, Hh, Ww, 4)).astype(np.float32)
    ori[0, 0, :2, 3] = 0.0          # some transparent pixels
    Wc = (rng.standard_normal((Hh * Ww * 3, C)) * 1e-3).astype(np.float32)

    net = gauss_net(
        torch.device("cpu"), 0.02, TinyClassifier(Wc), "my_model",
        epsilon=32.0,
    )
    net.train(False)
    wi = torch.tensor(np.stack([wgt, idx], axis=1))   # [B, 2, H, W, 8]
    sp = torch.tensor(spatial, requires_grad=True)
    x, x_rgba, cla, ori_t, ori_cla = net(sp, wi, torch.tensor(ori))
    g = torch.autograd.grad(cla[0, 0], sp, retain_graph=True)[0]

    out["gauss/spatial"] = spatial
    out["gauss/weights"] = wgt
    out["gauss/idx"] = idx.astype(np.int32)
    out["gauss/ori"] = ori
    out["gauss/Wc"] = Wc
    out["gauss/splat"] = x.detach().numpy()
    out["gauss/attacked_rgba"] = x_rgba.detach().numpy()
    out["gauss/logits"] = cla.detach().numpy()
    out["gauss/ori_logits"] = ori_cla.detach().numpy()
    out["gauss/grad"] = g.numpy()

    # ---- 5. classifier logits: vendored InceptionResNetV2 ----------------
    # (model/IncResv2.py:34-380 — the only reference classifier whose torch
    # source ships with the repo; torchvision is absent in this image, so
    # the torchvision-backed zoo entries have no executable reference.)
    # Weights are filled from a deterministic numpy RNG keyed only on each
    # tensor's KIND, so the test suite regenerates them from the flax
    # model's own (kind, shape) sequence without needing the reference —
    # any order/shape divergence breaks the regeneration and is caught.
    from model.IncResv2 import InceptionResNetV2 as TorchIncResV2

    net = TorchIncResV2(num_classes=8)
    net.eval()
    rng = np.random.default_rng(7)
    sd = net.state_dict()
    kinds = []
    kind = ""
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        kind = classify_torch_tensor(k, v.shape, prev=kind)
        kinds.append([kind, list(v.shape)])
        sd[k] = torch.tensor(fill_tensor(rng, kind, tuple(v.shape)))
    net.load_state_dict(sd)
    # full 299² — the reference's fixed AvgPool2d(8) tail needs the real
    # input size, and it exercises every stage at its true resolution
    x = rng.uniform(0, 255, (1, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        logits = net(
            torch.tensor((x / 127.5 - 1.0).transpose(0, 3, 1, 2))
        ).numpy()
    import json

    out["incresv2/input"] = x
    out["incresv2/logits"] = logits
    out["incresv2/kinds_json"] = np.frombuffer(
        json.dumps(kinds).encode(), dtype=np.uint8
    )

    # ---- 6. classifier logits: MyCNN (model/MyModel.py:5-53) --------------
    # The other torch-executable reference classifier (VERDICT r3 missing
    # #2): the 800²-input CNN the 2D baselines default to. Weights AND the
    # 800² input are drawn from one deterministic RNG stream — weights
    # first (kind order), input last — so only logits + kinds need storing;
    # the test regenerates the rest (7.7 MB input stays out of the repo).
    from model.MyModel import MyCNN as TorchMyCNN

    net = TorchMyCNN(num_classes=8)
    net.eval()
    rng = np.random.default_rng(11)
    sd = net.state_dict()
    kinds = []
    kind = ""
    for k, v in sd.items():
        kind = classify_torch_tensor(k, v.shape, prev=kind)
        kinds.append([kind, list(v.shape)])
        sd[k] = torch.tensor(fill_tensor(rng, kind, tuple(v.shape)))
    net.load_state_dict(sd)
    x = rng.uniform(0, 255, (1, 800, 800, 3)).astype(np.float32)
    with torch.no_grad():
        logits = net(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out["mycnn/logits"] = logits
    out["mycnn/kinds_json"] = np.frombuffer(
        json.dumps(kinds).encode(), dtype=np.uint8
    )

    path = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {len(out)} golden arrays to {path}")


def classify_torch_tensor(name: str, shape, prev: str = "") -> str:
    """Torch state_dict entry → kind label shared with
    nerfail_tpu.models.classifiers.torch_import.torch_tensor_shapes.
    `prev` is the previous entry's kind: a bare bias always follows its
    kernel in registration order, which beats name heuristics (MyCNN's
    denses are named fc1/fc2, not *linear*)."""
    if name.endswith("running_mean"):
        return "bn_mean"
    if name.endswith("running_var"):
        return "bn_var"
    if len(shape) == 4:
        return "conv_kernel"
    if len(shape) == 2:
        return "dense_kernel"
    if ".bn." in name:
        return "bn_scale" if name.endswith(".weight") else "bn_bias"
    if prev.endswith("_kernel"):
        return prev[:-7] + "_bias"
    return "dense_bias" if "linear" in name else "conv_bias"


def fill_tensor(rng: np.ndarray, kind: str, shape) -> np.ndarray:
    """Deterministic per-kind weight fill — MUST stay in sync with
    tests/test_classifier_parity.py's regeneration."""
    if kind in ("bn_var", "bn_scale"):
        return rng.uniform(0.5, 1.5, shape).astype(np.float32)
    if kind == "bn_mean":
        return (rng.standard_normal(shape) * 0.1).astype(np.float32)
    if kind.endswith("_kernel"):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)
    return (rng.standard_normal(shape) * 0.02).astype(np.float32)


if __name__ == "__main__":
    main()
