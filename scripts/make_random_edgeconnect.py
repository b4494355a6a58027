"""Emit random-init EdgeConnect generator checkpoints in the PUBLIC
layout ({'iteration': N, 'generator': state_dict}, spectral-norm
reparameterization on every edge-generator conv — the key layout of the
real EdgeModel_gen.pth / InpaintingModel_gen.pth the reference's inpaint
operator loads, models/operators.py:625-682).

The pretrained weights are not downloadable here (Google Drive, zero
egress), so these random-init twins prove the FULL interop path —
torch.load -> convert_edgeconnect_gen -> MODEL=3 pipeline inside a
planner run — executes end to end; swap in the real files for quality.

  python scripts/make_random_edgeconnect.py --out /tmp/edgeconnect_rand
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def make_generator_sd(rng, cin, cout_final, spectral, torch):
    """Random EdgeConnect generator state_dict (public torch naming)."""
    sd = {}

    def add(name, w, b):
        if spectral:
            # torch spectral_norm layout: weight_orig + power-iteration
            # vectors u/v over the dim-0 flattening (the resolver computes
            # sigma = u^T W v and divides)
            wm = torch.from_numpy(w).reshape(w.shape[0], -1)
            u, s, vh = torch.linalg.svd(wm, full_matrices=False)
            sd[f"{name}.weight_orig"] = torch.from_numpy(w)
            sd[f"{name}.weight_u"] = u[:, 0].contiguous()
            sd[f"{name}.weight_v"] = vh[0].contiguous()
        else:
            sd[f"{name}.weight"] = torch.from_numpy(w)
        sd[f"{name}.bias"] = torch.from_numpy(b)

    def conv(name, ci, co, k):
        add(name, rng.standard_normal((co, ci, k, k)).astype(np.float32)
            * 0.08, rng.standard_normal(co).astype(np.float32) * 0.05)

    def convT(name, ci, co):
        add(name, rng.standard_normal((ci, co, 4, 4)).astype(np.float32)
            * 0.08, rng.standard_normal(co).astype(np.float32) * 0.05)

    conv("encoder.1", cin, 64, 7)
    conv("encoder.4", 64, 128, 4)
    conv("encoder.7", 128, 256, 4)
    for i in range(8):
        conv(f"middle.{i}.conv_block.1", 256, 256, 3)
        conv(f"middle.{i}.conv_block.5", 256, 256, 3)
    convT("decoder.0", 256, 128)
    convT("decoder.3", 128, 64)
    conv("decoder.7", 64, cout_final, 7)
    return sd


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)
    import torch

    os.makedirs(a.out, exist_ok=True)
    rng = np.random.default_rng(a.seed)
    # public EdgeGenerator: spectral norm on every conv; InpaintGenerator:
    # plain convs (use_spectral_norm=False)
    edge = make_generator_sd(rng, cin=3, cout_final=1, spectral=True,
                             torch=torch)
    inp = make_generator_sd(rng, cin=4, cout_final=3, spectral=False,
                            torch=torch)
    for fname, sd in (("EdgeModel_gen.pth", edge),
                      ("InpaintingModel_gen.pth", inp)):
        path = os.path.join(a.out, fname)
        torch.save({"iteration": 0, "generator": sd}, path)
        print(f"wrote {path} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
