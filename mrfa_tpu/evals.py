"""Evaluation drivers: reconstruction metrics harness and animation mode.

Mirrors /root/reference/reconstruction.py:22-82 and animate_ddp.py:40-124:
  - reconstruction: source = frame 0, reconstruct every frame; L1 / LPIPS /
    PSNR means over all frames; per-video prediction strips + visualization
    videos,
  - animate: relative-motion transfer over PairedDataset pairs, mp4 out.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mrfa_tpu.animate import Animator
from mrfa_tpu.data.dataset import PairedDataset
from mrfa_tpu.metrics import LpipsVgg, l1, psnr
from mrfa_tpu.models.mrfa import MRFA
from mrfa_tpu.utils.logger import Visualizer


from mrfa_tpu.utils.video import save_image as _imsave, save_video


def _mimsave(path, frames, fps=25):
    save_video(path, frames, fps=fps)


def reconstruction(
    config: Dict[str, Any],
    model: MRFA,
    variables: Dict[str, Any],
    log_dir: str,
    dataset,
    *,
    lpips_variables: Optional[Dict[str, Any]] = None,
    save_visualizations: bool = True,
) -> Dict[str, float]:
    png_dir = os.path.join(log_dir, "reconstruction/png")
    log_dir = os.path.join(log_dir, "reconstruction")
    os.makedirs(png_dir, exist_ok=True)

    lpips_mod = LpipsVgg(use_linear_weights=lpips_variables is not None)
    if lpips_variables is None:
        size = config["raft_flow"]["size"]
        dummy = jnp.zeros((1, size, size, 3))
        lpips_variables = lpips_mod.init(jax.random.PRNGKey(0), dummy, dummy)

    @jax.jit
    def eval_frame(variables, source, driving):
        gen, warp_vis, _, kp_s, kp_d = model.apply(
            variables, source, driving, train=False
        )
        m_l1 = l1(gen, driving)
        m_psnr = psnr(gen, driving)
        m_lpips = jnp.mean(lpips_mod.apply(lpips_variables, driving, gen))
        return gen, warp_vis, kp_s, kp_d, m_l1, m_lpips, m_psnr

    visualizer = Visualizer(**(config.get("visualizer_params") or {}))
    num_videos = config["reconstruction_params"].get("num_videos")
    fmt = config["reconstruction_params"].get("format", ".mp4")

    loss_list, lpips_list, psnr_list = [], [], []
    for it in range(len(dataset)):
        if num_videos is not None and it > num_videos:
            break
        x = dataset[it]
        video = x["video"]  # (T, H, W, 3)
        source = jnp.asarray(video[0])[None]
        predictions, visualizations = [], []
        for t in range(video.shape[0]):
            driving = jnp.asarray(video[t])[None]
            gen, warp_vis, kp_s, kp_d, m_l1, m_lpips, m_psnr = eval_frame(
                variables, source, driving
            )
            loss_list.append(float(m_l1))
            lpips_list.append(float(m_lpips))
            psnr_list.append(float(m_psnr))
            gen_np = np.asarray(gen[0])
            predictions.append(gen_np)
            if save_visualizations:
                vis = visualizer.visualize(
                    source=np.asarray(source),
                    driving=np.asarray(driving),
                    out=np.concatenate([np.asarray(warp_vis), np.asarray(gen)], axis=2),
                    kp_s=np.asarray(kp_s),
                    kp_d=np.asarray(kp_d),
                )
                visualizations.append(vis)
        strip = np.concatenate(predictions, axis=1)
        _imsave(os.path.join(png_dir, x["name"] + ".png"),
                (255 * np.clip(strip, 0, 1)).astype(np.uint8))
        if save_visualizations:
            _mimsave(os.path.join(log_dir, x["name"] + fmt), visualizations)

    results = {
        "l1": float(np.mean(loss_list)) if loss_list else float("nan"),
        "lpips": float(np.mean(lpips_list)) if lpips_list else float("nan"),
        "psnr": float(np.mean(psnr_list)) if psnr_list else float("nan"),
        "frames": len(loss_list),
    }
    print(f"Reconstruction loss (L1): {results['l1']}")
    print(f"lpips loss: {results['lpips']}")
    print(f"psnr: {results['psnr']}")
    return results


def animate(
    config: Dict[str, Any],
    model: MRFA,
    variables: Dict[str, Any],
    log_dir: str,
    dataset,
) -> None:
    log_dir = os.path.join(log_dir, "animation")
    os.makedirs(log_dir, exist_ok=True)
    params = config["animate_params"]
    norm = params.get("normalization_params", params)

    paired = PairedDataset(dataset, number_of_pairs=params["num_pairs"])
    animator = Animator(
        model,
        variables,
        relative=norm.get("use_relative_movement", True),
        use_relative_jacobian=norm.get("use_relative_jacobian", True),
    )
    visualizer = Visualizer(**(config.get("visualizer_params") or {}))

    for it in range(len(paired)):
        x = paired[it]
        driving_video = x["driving_video"]  # (T, H, W, 3)
        source = x["source_video"][0]
        clip_state = animator.begin(
            source, driving_video[0],
            adapt_movement_scale=norm.get("adapt_movement_scale", False),
        )
        visualizations = []
        for t in range(driving_video.shape[0]):
            out, _, _ = animator.animate_frame(clip_state, driving_video[t])
            vis = visualizer.visualize(
                source=source[None],
                driving=driving_video[t : t + 1],
                out=np.asarray(out),
            )
            visualizations.append(vis)
        name = f"{x['driving_name']}-{x['source_name']}.mp4"
        _mimsave(os.path.join(log_dir, name), visualizations)
