"""MRFA composite model: prior encoder + dense motion + RaftFlow + losses.

Behavioral spec re-derived from /root/reference/modules/model.py:145-257:
  - swappable motion priors (mtia | fomm | tpsm) chosen by
    train_params.prior_model,
  - background affine predictor gated by epoch >= bg_start,
  - TPSM channel-dropout schedule on the dense-motion softmax,
  - losses: multi-scale VGG19 perceptual pyramid, keypoint (+ jacobian)
    equivariance under a random affine+TPS warp, background consistency.

The module is functional: randomness arrives via the 'equivariance' and
'dropout' rng streams; `epoch`-derived gates (`use_bg`, `dropout_flag`) are
static python bools so the jitted graph stays stable within a phase.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrfa_tpu.models.bg_motion import BGMotionPredictor
from mrfa_tpu.models.dense_motion import DenseMotionNetwork, TPSDenseMotionNetwork
from mrfa_tpu.models.kp_detector import KPDetector, TPSKPDetector
from mrfa_tpu.models.raft import RaftFlow
from mrfa_tpu.models.tokenpose import TokenPoseB
from mrfa_tpu.nn.vgg import Vgg19
from mrfa_tpu.ops.resize import AntiAliasParams, antialias_downsample
from mrfa_tpu.ops.tps import (
    random_transform_frame,
    random_transform_jacobian,
    random_transform_params,
    random_transform_warp,
)


def mtia_encoder_from_cfg(
    mtia_cfg: Dict[str, Any], name: str = "encoder", cls=TokenPoseB
) -> TokenPoseB:
    """Build the MTIA TokenPose encoder from the caps-style MODEL config."""
    m = mtia_cfg["MODEL"]
    return cls(
        num_keypoints=m["NUM_JOINTS"],
        dim=m["DIM"],
        depth=m["TRANSFORMER_DEPTH"],
        heads=m["TRANSFORMER_HEADS"],
        mlp_ratio=m.get("TRANSFORMER_MLP_RATIO", 3),
        image_size=m["IMAGE_SIZE"][0],
        patch_size=m["PATCH_SIZE"][0],
        base_channel=m.get("BASE_CHANNEL", 32),
        estimate_jacobian=m.get("ESTIMATE_JACOBIAN", True),
        name=name,
    )


class MRFA(nn.Module):
    cfg: Dict[str, Any]

    def setup(self):
        cfg = self.cfg
        tp = cfg["train_params"]
        self.prior_model = tp["prior_model"]
        self.scales = list(tp["scales"])
        self.loss_weights = tp["loss_weights"]
        self.bg_start = tp["bg_start"]

        remat = tp.get("remat", False)

        def enc_cls(base):
            # remat the kp encoder as a unit (runs 3x per train step: source,
            # driving, equivariance-transformed); train flag is static arg 2
            return nn.remat(base, static_argnums=(2,)) if remat else base

        if self.prior_model == "fomm":
            self.encoder = enc_cls(KPDetector)(
                **cfg["fomm_kp_detector"], name="encoder"
            )
            self.dense_motion = DenseMotionNetwork(
                **cfg["dense_motion"], name="dense_motion"
            )
        elif self.prior_model == "tpsm":
            self.encoder = enc_cls(TPSKPDetector)(
                **cfg["tpsm_kp_detector"], name="encoder"
            )
            self.dense_motion = TPSDenseMotionNetwork(
                **cfg["tpsm_dense_motion"], name="dense_motion"
            )
        elif self.prior_model == "mtia":
            self.encoder = mtia_encoder_from_cfg(
                cfg["mtia_kp_detector"], name="encoder", cls=enc_cls(TokenPoseB)
            )
            self.dense_motion = DenseMotionNetwork(
                **cfg["dense_motion"], name="dense_motion"
            )
        else:
            raise ValueError(f"unknown prior_model {self.prior_model!r}")

        if tp["bg_start"] < tp["num_epochs"]:
            self.bg_predictor = BGMotionPredictor(name="bg_predictor")

        raft_kwargs = dict(cfg["raft_flow"])
        # remat granularity lives inside RaftFlow (per refinement iteration +
        # generator encode/decode as units) — finer than whole-decoder remat,
        # so the backward replays one iteration at a time instead of the
        # entire 6-scale loop
        raft_kwargs.setdefault("remat", remat)
        self.decoder = RaftFlow(**raft_kwargs, name="decoder")
        if sum(self.loss_weights["perceptual"]) != 0:
            vgg_cls = nn.remat(Vgg19) if remat else Vgg19  # __call__(x): no static args
            self.vgg = vgg_cls(name="vgg")
        self._aa_down = AntiAliasParams.create(0.25)
        self._aa_scales = {
            s: AntiAliasParams.create(s) for s in self.scales
        }

    def encode_kp(self, image: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        # positional call: remat static_argnums indexes positional args
        return self.encoder(image, train)

    def run_dense_motion(self, source, kp_d, kp_s, bg_param, dropout_flag, dropout_p, train):
        return self.dense_motion(
            source, kp_d, kp_s, bg_param=bg_param,
            dropout_flag=dropout_flag, dropout_p=dropout_p, train=train,
        )

    def kp_for_decoder(self, kp: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """TPSM keypoints are averaged 5 -> 1 per group before RaftFlow."""
        v = kp["kp"]
        if self.prior_model == "tpsm":
            b = v.shape[0]
            return v.reshape(b, -1, 5, 2).mean(axis=2)
        return v

    def encode_source_cache(self, source, kp_source, img_down):
        """Per-clip-constant decoder source work for serving (eval mode):
        generator feature pyramid + source correlation projection. Pass the
        result as `source_cache` to `decoder(...)` in the frame loop."""
        return self.decoder.encode_source(
            self.kp_for_decoder(kp_source), img_down, source, False
        )

    def pyramid(self, x: jnp.ndarray) -> Dict[float, jnp.ndarray]:
        return {s: antialias_downsample(x, self._aa_scales[s]) for s in self.scales}

    def __call__(
        self,
        source: jnp.ndarray,
        driving: jnp.ndarray,
        *,
        train: bool = False,
        compute_loss: bool = False,
        use_bg: bool = False,
        dropout_flag: bool = False,
        dropout_p=0.0,
    ):
        kp_s = self.encode_kp(source, train)
        kp_d = self.encode_kp(driving, train)

        img_down = antialias_downsample(source, self._aa_down)
        bg_param = self.bg_predictor(source, driving, train) if use_bg else None

        dense_motion = self.run_dense_motion(
            source, kp_d, kp_s, bg_param, dropout_flag, dropout_p, train
        )

        # positional call: remat static_argnums indexes positional args
        gen, warp_img, occlusion = self.decoder(
            self.kp_for_decoder(kp_s),
            self.kp_for_decoder(kp_d),
            dense_motion,
            img_down,
            source,
            train,
        )
        # visualization strip: warped image followed by occlusion maps (as RGB)
        warp_vis = jnp.concatenate(
            [warp_img, jnp.repeat(occlusion, 3, axis=-1)], axis=2
        )

        loss_values: Dict[str, jnp.ndarray] = {}
        if not compute_loss:
            return gen, warp_vis, loss_values, kp_s["kp"], kp_d["kp"]

        # ------------------- perceptual pyramid loss -------------------
        if sum(self.loss_weights["perceptual"]) != 0:
            pyr_real = self.pyramid(driving)
            pyr_gen = self.pyramid(gen)
            total = 0.0
            for s in self.scales:
                x_feats = self.vgg(pyr_gen[s])
                y_feats = self.vgg(pyr_real[s])
                for i, weight in enumerate(self.loss_weights["perceptual"]):
                    value = jnp.mean(
                        jnp.abs(x_feats[i] - jax.lax.stop_gradient(y_feats[i]))
                    )
                    total = total + weight * value
            loss_values["perceptual"] = total

        # ------------------- equivariance losses -------------------
        if self.loss_weights["equivariance"] != 0:
            tparams = random_transform_params(
                self.make_rng("equivariance"),
                driving.shape[0],
                **self.cfg["train_params"]["transform_params"],
            )
            transformed_frame = random_transform_frame(tparams, driving)
            transformed_kp = self.encode_kp(transformed_frame, train)
            warped_back = random_transform_warp(tparams, transformed_kp["kp"])
            value = jnp.mean(jnp.abs(kp_d["kp"] - warped_back))
            loss_values["equivariance"] = self.loss_weights["equivariance"] * value

            if (
                self.loss_weights.get("equivariance_jacobian", 0) != 0
                and "jacobian" in kp_d
            ):
                t_jac = random_transform_jacobian(tparams, transformed_kp["kp"])
                jacobian_transformed = jnp.matmul(t_jac, transformed_kp["jacobian"])
                normed_driving = jnp.linalg.inv(kp_d["jacobian"])
                value = jnp.matmul(normed_driving, jacobian_transformed)
                eye = jnp.eye(2, dtype=value.dtype)
                value = jnp.mean(jnp.abs(eye - value))
                loss_values["equivariance_jacobian"] = (
                    self.loss_weights["equivariance_jacobian"] * value
                )

        # ------------------- background consistency -------------------
        if use_bg:
            bg_param_reverse = self.bg_predictor(driving, source, train)
            value = jnp.matmul(bg_param, bg_param_reverse)
            eye = jnp.eye(3, dtype=value.dtype)
            loss_values["bg"] = 10.0 * jnp.mean(jnp.abs(eye - value))

        return gen, warp_vis, loss_values, kp_s["kp"], kp_d["kp"]
