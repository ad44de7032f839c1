#!/usr/bin/env python
"""Generate tests/goldens/albumentations_golden.npz.

Run this anywhere albumentations 1.3.x IS installed (it is absent from the
build/CI image and pip there has no egress); commit the resulting .npz so
tests/test_albumentations_golden.py's direct goldens execute everywhere.

The inputs are reproduced bit-exactly from the test module's _img(seed)
helper, so the stored arrays match what the tests compare against.
"""

import os

import numpy as np


def _img(seed=0, h=37, w=41):
    return np.random.default_rng(seed).uniform(0, 1, (h, w, 3)).astype(np.float32)


def main():
    import albumentations as alb
    import albumentations.augmentations.geometric.functional as F

    out = {}
    img4 = _img(4)
    for angle in (-5.0, -1.3, 2.8, 5.0):
        out[f"rotate_{angle}"] = F.rotate(img4, angle)

    from albumentations.augmentations.functional import \
        brightness_contrast_adjust

    out["brightness_contrast"] = brightness_contrast_adjust(
        _img(5), alpha=1.15, beta=-0.1, beta_by_max=True)

    img6 = _img(6)
    for k in (3, 5):
        out[f"blur_{k}"] = alb.GaussianBlur(blur_limit=(k, k), p=1.0)(
            image=img6)["image"]

    out["vflip"] = alb.Compose([alb.VerticalFlip(p=1.0)])(image=_img(7))["image"]

    dest = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                        "albumentations_golden.npz")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    np.savez(dest, **out)
    print("wrote", os.path.abspath(dest), "keys:", sorted(out))


if __name__ == "__main__":
    main()
