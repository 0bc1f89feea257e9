"""Single-frame inference API (reference second/core/inference.py:11-123
+ second/pytorch/inference.py TorchInferenceContext).

Usage (the notebook / kittiviewer flow):

    ctx = InferenceContext()
    ctx.build(config_path)
    ctx.restore(ckpt_path)          # or ctx.init_random()
    example = ctx.get_inference_input_dict(info, points)
    dets = ctx.inference(example)
"""

import numpy as np

from ..builders import build_network, dataset_builder
from ..configs import load_pipeline_config
from ..data.preprocess import merge_second_batch, prep_pointcloud


class InferenceContext:
    def __init__(self):
        self.config = None
        self.parts = None
        self.prep_func = None
        self._state = None
        self._eval_step = None

    def build(self, config_path_or_config, use_banded="auto"):
        """use_banded: "auto" = banded MXU-gather sparse-conv kernels
        + host rulebook planning for sparse middles on TPU (the
        production inference path; exact-parity alternative to the
        all-device rulebook build)."""
        if isinstance(config_path_or_config, str):
            self.config = load_pipeline_config(config_path_or_config)
        else:
            self.config = config_path_or_config
        if use_banded == "auto":
            from ..train.__main__ import _auto_banded

            use_banded = _auto_banded(self.config)
        self.parts = build_network(self.config, use_banded=use_banded)
        input_cfg = self.config.eval_input_reader
        model_cfg = self.parts["model_cfg"]
        from functools import partial

        from ..utils.config_tool import get_downsample_factor

        max_voxels = input_cfg.preprocess.max_number_of_voxels or 20000
        sparse_scales = None
        mid_name = model_cfg.middle_feature_extractor.module_class_name
        from ..models.sparse_middle import SPARSE_MIDDLE_NAMES

        if mid_name in SPARSE_MIDDLE_NAMES:
            from ..models.sparse_middle import plan_scales

            sparse_scales = plan_scales(
                mid_name, self.parts["dense_shape"], max_voxels)
        self.prep_func = partial(
            prep_pointcloud,
            root_path="",
            voxel_generator=self.parts["voxel_generator"],
            target_assigner=self.parts["target_assigner"],
            training=False,
            max_voxels=max_voxels,
            shuffle_points=False,
            anchor_area_threshold=input_cfg.preprocess.anchor_area_threshold,
            anchor_cache=self.parts["anchor_cache"],
            out_size_factor=get_downsample_factor(model_cfg),
            num_point_features=model_cfg.num_point_features,
            sparse_plan_scales=sparse_scales,
            sparse_plan_banded=use_banded,
        )
        # PillarFeatureNet-family inference runs the flat pillar path
        # (models/pp_fast.py): ship the points, skip the [V, T, F]
        # buffer; prep still computes anchors_mask from host voxels
        self._flat_pp = None
        vfe_name = model_cfg.voxel_feature_extractor.module_class_name
        if (sparse_scales is None
                and vfe_name.startswith("PillarFeatureNet")):
            self._flat_pp = dict(
                gen=self.parts["voxel_generator"],
                model_cfg=model_cfg, max_voxels=max_voxels)

    def get_inference_input_dict(self, info, points):
        assert self.parts is not None, "call build first"
        input_dict = {
            "lidar": {"type": "lidar", "points": points},
            "metadata": {
                "image_idx": info["image"]["image_idx"]
                if "image" in info else 0,
            },
        }
        if "calib" in info:
            calib = info["calib"]
            input_dict["calib"] = {
                "rect": calib["R0_rect"],
                "Trv2c": calib["Tr_velo_to_cam"],
                "P2": calib["P2"],
            }
            input_dict["image"] = info.get("image")
        example = self.prep_func(input_dict=input_dict)
        if self._flat_pp is not None:
            from ..builders.dataset_builder import POINTS_BUFFER

            pts = input_dict["lidar"]["points"]
            buf = np.zeros(
                (POINTS_BUFFER, pts.shape[1]), np.float32)
            count = min(len(pts), POINTS_BUFFER)
            buf[:count] = pts[:count]
            example["points"] = buf
            example["points_count"] = np.array([count], np.int32)
            example.pop("voxels", None)
            example.pop("num_points", None)
            example.pop("coordinates", None)
        example["metadata"] = input_dict["metadata"]
        return merge_second_batch([example])

    def init_random(self, seed=0):
        import jax

        from ..train.state import TrainState
        from ..train import optimizer as opt_builder

        net = self.parts["net"]
        gen = self.parts["voxel_generator"]
        V = self.config.eval_input_reader.preprocess.max_number_of_voxels \
            or 20000
        T = gen.max_num_points_per_voxel
        nf = self.parts["model_cfg"].num_point_features
        variables = net.init(
            jax.random.PRNGKey(seed),
            np.zeros((1, V, T, nf), np.float32),
            np.zeros((1, V), np.int32),
            np.full((1, V, 3), -1, np.int32))
        tx, _, _ = opt_builder.build(
            self.config.train_config.optimizer,
            self.config.train_config.steps or 1)
        self._state = TrainState.create(variables, tx)

    def restore(self, ckpt_path):
        from ..train import checkpoint as ckpt_lib

        if self._state is None:
            self.init_random()
        self._state = ckpt_lib.restore(ckpt_path, self._state)

    def restore_latest(self, model_dir):
        from ..train import checkpoint as ckpt_lib

        if self._state is None:
            self.init_random()
        self._state, step = ckpt_lib.try_restore_latest(
            model_dir, "voxelnet", self._state)
        return step

    def inference(self, example):
        """Returns ragged per-frame detection dicts."""
        import jax.numpy as jnp

        from ..train.state import make_eval_step

        if self._eval_step is None:
            assert self._state is not None, "restore or init_random first"
            self._eval_step = make_eval_step(
                self.parts["net"], self.parts["spec"],
                flat_pp=self._flat_pp)
        from ..train.__main__ import example_convert

        ex = {k: jnp.asarray(v) for k, v in example_convert(example).items()}
        dets = self._eval_step(self._state, ex)
        dets = {k: np.asarray(v) for k, v in dets.items()}
        out = []
        for b in range(dets["box3d_lidar"].shape[0]):
            valid = dets["valid"][b]
            out.append({
                "box3d_lidar": dets["box3d_lidar"][b][valid],
                "scores": dets["scores"][b][valid],
                "label_preds": dets["label_preds"][b][valid],
                "metadata": example.get("metadata", [None])[b],
            })
        return out
