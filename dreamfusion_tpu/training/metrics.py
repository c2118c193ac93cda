"""Image quality metrics: PSNR, SSIM (mipnerf-style), LPIPS (gated).

Rebuilds frameworks/nerf/utils.py:193-262 (rgb_ssim — the mipnerf SSIM port —
and rgb_lpips). LPIPS requires the `lpips` torch package + weights; it is
gated behind availability like the reference's lazy import.
"""

from __future__ import annotations

import numpy as np


def rgb_psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    mse = float(np.mean((pred - gt) ** 2))
    return -10.0 * np.log10(max(mse, 1e-10))


def rgb_ssim(img0: np.ndarray, img1: np.ndarray, max_val: float = 1.0,
             filter_size: int = 11, filter_sigma: float = 1.5,
             k1: float = 0.01, k2: float = 0.03,
             return_map: bool = False):
    """SSIM with a separable Gaussian filter (the mipnerf implementation the
    reference ports at frameworks/nerf/utils.py:198-244)."""
    assert img0.shape == img1.shape and img0.ndim == 3
    img0 = np.asarray(img0, np.float64)
    img1 = np.asarray(img1, np.float64)

    hw = filter_size // 2
    shift = np.arange(-hw, hw + 1)
    f_i = ((shift / filter_sigma) ** 2) / 2
    filt = np.exp(-f_i)
    filt /= np.sum(filt)

    def convolve2d(z, f):
        return np.stack([
            _conv2d_sep(z[..., i], f) for i in range(z.shape[-1])], -1)

    def _conv2d_sep(z, f):
        from numpy.lib.stride_tricks import sliding_window_view

        pad = len(f) // 2
        zp = np.pad(z, ((pad, pad), (0, 0)), mode="symmetric")
        z1 = np.einsum("ijk,k->ij",
                       sliding_window_view(zp, len(f), axis=0), f)
        zp = np.pad(z1, ((0, 0), (pad, pad)), mode="symmetric")
        return np.einsum("ijk,k->ij",
                         sliding_window_view(zp, len(f), axis=1), f)

    mu0 = convolve2d(img0, filt)
    mu1 = convolve2d(img1, filt)
    mu00 = mu0 * mu0
    mu11 = mu1 * mu1
    mu01 = mu0 * mu1
    sigma00 = convolve2d(img0 ** 2, filt) - mu00
    sigma11 = convolve2d(img1 ** 2, filt) - mu11
    sigma01 = convolve2d(img0 * img1, filt) - mu01

    sigma00 = np.maximum(0.0, sigma00)
    sigma11 = np.maximum(0.0, sigma11)
    sigma01 = np.sign(sigma01) * np.minimum(np.sqrt(sigma00 * sigma11),
                                            np.abs(sigma01))
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    return ssim_map if return_map else float(np.mean(ssim_map))


_lpips_models = {}


def rgb_lpips(np_gt: np.ndarray, np_im: np.ndarray, net_name: str = "alex",
              device: str = "cpu") -> float:
    """LPIPS via the torch `lpips` package (frameworks/nerf/utils.py:247-262).
    Raises ImportError with a pointer when lpips isn't installed."""
    try:
        import lpips  # type: ignore
        import torch
    except ImportError as e:
        raise ImportError(
            "rgb_lpips needs the `lpips` package (pip install lpips) and its "
            "pretrained weights; unavailable in this environment") from e
    if net_name not in _lpips_models:
        _lpips_models[net_name] = lpips.LPIPS(net=net_name, version="0.1")
    model = _lpips_models[net_name]
    gt = torch.from_numpy(np_gt.astype(np.float32)).permute(2, 0, 1)[None]
    im = torch.from_numpy(np_im.astype(np.float32)).permute(2, 0, 1)[None]
    return float(model(gt, im, normalize=True).item())
