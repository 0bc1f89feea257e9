"""Golden-activation tests for the torch checkpoint import tool
(second_tpu/utils/checkpoint_import.py; SURVEY hard-part #5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from flax import linen as nn  # noqa: E402

from second_tpu.utils import checkpoint_import as ci  # noqa: E402


def test_conv2d_golden():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 10, 10).astype(np.float32)
    tconv = torch.nn.Conv2d(8, 16, 3, stride=2, padding=1, bias=False)
    with torch.no_grad():
        ty = tconv(torch.from_numpy(x)).numpy()
    fconv = nn.Conv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False)
    fy = fconv.apply(
        {"params": {"kernel": jnp.asarray(ci._conv_oihw(tconv.weight))}},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(fy).transpose(0, 3, 1, 2), ty, atol=1e-4, rtol=1e-4)


def test_convtranspose2d_golden():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 10, 10).astype(np.float32)
    tdc = torch.nn.ConvTranspose2d(8, 16, 2, stride=2, bias=False)
    with torch.no_grad():
        ty = tdc(torch.from_numpy(x)).numpy()
    fdc = nn.ConvTranspose(16, (2, 2), strides=(2, 2), padding="VALID",
                           use_bias=False)
    fy = fdc.apply(
        {"params": {
            "kernel": jnp.asarray(ci._convtranspose_iohw(tdc.weight))}},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(fy).transpose(0, 3, 1, 2), ty, atol=1e-4, rtol=1e-4)


def test_linear_bn_golden():
    from second_tpu.models.layers import LinearBNReLU

    rng = np.random.RandomState(2)
    x = rng.randn(4, 50, 9).astype(np.float32)
    tlin = torch.nn.Linear(9, 16, bias=False)
    tbn = torch.nn.BatchNorm1d(16, eps=1e-3, momentum=0.01)
    tbn.running_mean.normal_()
    tbn.running_var.uniform_(0.5, 2.0)
    tbn.eval()
    with torch.no_grad():
        ty = torch.relu(
            tbn(tlin(torch.from_numpy(x)).permute(0, 2, 1)).permute(0, 2, 1)
        ).numpy()
    layer = LinearBNReLU(16, use_norm=True)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {
        "Dense_0": {"kernel": jnp.asarray(ci._linear(tlin.weight))},
        "MaskedBatchNorm_0": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
    }
    stats = {"MaskedBatchNorm_0": {
        "mean": jnp.asarray(tbn.running_mean.numpy()),
        "var": jnp.asarray(tbn.running_var.numpy()),
    }}
    del variables
    fy = layer.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(fy), ty, atol=1e-4, rtol=1e-4)


def test_rpn_import_golden():
    """Import the REFERENCE RPNV2's random-initialized weights and
    check our RPNV2 reproduces its outputs end-to-end."""
    from reference_torch import load_reference_rpn

    ref_rpn = load_reference_rpn()
    if ref_rpn is None:
        pytest.skip("reference tree not importable")

    from second_tpu.models.rpn import RPNV2

    kwargs = dict(
        use_norm=True, num_class=1, layer_nums=[2, 2],
        layer_strides=[2, 2], num_filters=[16, 32],
        upsample_strides=[1, 2], num_upsample_filters=[16, 16],
        num_input_features=8, num_anchor_per_loc=2,
        encode_background_as_zeros=True, use_direction_classifier=True,
        use_groupnorm=False, num_groups=32, box_code_size=7,
        num_direction_bins=2)
    tref = ref_rpn.RPNV2(**kwargs)
    tref.eval()
    # make BN stats non-trivial
    for m in tref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.8, 1.2)

    rng = np.random.RandomState(3)
    x = rng.randn(1, 8, 40, 48).astype(np.float32)
    with torch.no_grad():
        ref_out = tref(torch.from_numpy(x))

    mine = RPNV2(**{k: tuple(v) if isinstance(v, list) else v
                    for k, v in kwargs.items()})
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = mine.init(jax.random.PRNGKey(0), x_nhwc)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    # nest under "rpn" to reuse the full-model mapping helpers
    sd = {f"rpn.{k}": v for k, v in tref.state_dict().items()}
    params = ci._flatten({"rpn": variables["params"]})
    stats = ci._flatten({"rpn": variables["batch_stats"]})
    asg = ci._Assign(dict(params), dict(stats))
    ci._map_rpn(asg, sd, list(params))
    assert not asg.missing, asg.missing
    new_vars = {
        "params": ci._unflatten(asg.params)["rpn"],
        "batch_stats": ci._unflatten(asg.stats)["rpn"],
    }
    my_out = mine.apply(new_vars, x_nhwc)

    for key in ("box_preds", "cls_preds", "dir_cls_preds"):
        ref_flat = ref_out[key].numpy().reshape(1, -1)
        my_flat = np.asarray(my_out[key]).reshape(1, -1)
        np.testing.assert_allclose(
            my_flat, ref_flat, atol=2e-3, rtol=1e-3, err_msg=key)


def test_full_state_dict_import_structural(tmp_path):
    """Synthesize a reference-shaped state_dict for xyres_16 and import
    it through the public entry point (structure + transposes)."""
    from second_tpu.builders import build_network
    from second_tpu.utils.config_tool import read_config

    cfg_path = "/root/reference/second/configs/pointpillars/car/xyres_16.config"
    import os
    if not os.path.exists(cfg_path):
        pytest.skip("reference configs absent")
    cfg = read_config(cfg_path)
    parts = build_network(cfg.model.second)
    net, gen = parts["net"], parts["voxel_generator"]
    T = gen.max_num_points_per_voxel
    variables = net.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 64, T, 4), np.float32),
        np.zeros((1, 64), np.int32),
        np.full((1, 64, 3), -1, np.int32))
    variables = jax.tree_util.tree_map(np.asarray, variables)

    from reference_torch import load_reference_rpn
    ref_rpn = load_reference_rpn()
    if ref_rpn is None:
        pytest.skip("reference tree not importable")
    mc = cfg.model.second
    tref = ref_rpn.RPNV2(
        use_norm=True, num_class=1,
        layer_nums=list(mc.rpn.layer_nums),
        layer_strides=[int(v) for v in mc.rpn.layer_strides],
        num_filters=list(mc.rpn.num_filters),
        upsample_strides=[int(v) for v in mc.rpn.upsample_strides],
        num_upsample_filters=list(mc.rpn.num_upsample_filters),
        num_input_features=64, num_anchor_per_loc=2,
        encode_background_as_zeros=True, use_direction_classifier=True,
        use_groupnorm=False, num_groups=32, box_code_size=7,
        num_direction_bins=2)
    sd = {f"rpn.{k}": v for k, v in tref.state_dict().items()}
    # PFN layer
    sd["voxel_feature_extractor.pfn_layers.0.linear.weight"] = (
        torch.randn(64, 9))
    for part, shape in (("weight", 64), ("bias", 64),
                        ("running_mean", 64), ("running_var", 64)):
        sd[f"voxel_feature_extractor.pfn_layers.0.norm.{part}"] = (
            torch.randn(shape).abs() + 0.5)
    new_vars, report = ci.import_state_dict(sd, variables)
    assert not report["missing_targets"], report["missing_targets"]
    # every model leaf assigned except none (PP has no middle params)
    n_leaves = len(ci._flatten(variables["params"])) + len(
        ci._flatten(variables["batch_stats"]))
    assert len(report["assigned"]) == n_leaves
    preds = net.apply(
        new_vars,
        np.zeros((1, 64, T, 4), np.float32),
        np.zeros((1, 64), np.int32),
        np.full((1, 64, 3), -1, np.int32))
    assert np.isfinite(np.asarray(preds["box_preds"])).all()


@pytest.mark.parametrize("cls_name", ["PillarFeatureNet",
                                      "PillarFeatureNetOld"])
def test_pfn_import_golden(cls_name):
    """Reference PillarFeatureNet weights imported into ours must
    reproduce the pillar features — validates both the weight mapping
    and the pillar decoration math (cluster/center offsets)."""
    from reference_torch import REFERENCE_ROOT, install_stubs
    import os
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference tree absent")
    install_stubs()
    try:
        from second.pytorch.models import pointpillars as ref_pp
    except Exception:
        pytest.skip("reference tree not importable")

    from second_tpu.models.registry import get_vfe_class

    voxel_size = (0.16, 0.16, 4.0)
    pc_range = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    kwargs = dict(num_input_features=4, use_norm=True, num_filters=(64,),
                  with_distance=False, voxel_size=voxel_size,
                  pc_range=pc_range)
    tref = getattr(ref_pp, cls_name)(**kwargs)
    tref.eval()
    for m in tref.modules():
        if hasattr(m, "running_mean"):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.8, 1.2)

    rng = np.random.RandomState(5)
    V, T = 40, 20
    counts = rng.randint(1, T + 1, V)
    voxels = np.zeros((V, T, 4), np.float32)
    coords = np.zeros((V, 4), np.int32)  # torch side: (batch, z, y, x)
    coords[:, 2] = rng.randint(0, 496, V)
    coords[:, 3] = rng.randint(0, 432, V)
    for i in range(V):
        n = counts[i]
        cx = pc_range[0] + (coords[i, 3] + 0.5) * voxel_size[0]
        cy = pc_range[1] + (coords[i, 2] + 0.5) * voxel_size[1]
        voxels[i, :n, 0] = cx + rng.uniform(-0.08, 0.08, n)
        voxels[i, :n, 1] = cy + rng.uniform(-0.08, 0.08, n)
        voxels[i, :n, 2] = rng.uniform(-2.0, 0.5, n)
        voxels[i, :n, 3] = rng.uniform(0, 1, n)

    with torch.no_grad():
        # .copy(): PillarFeatureNetOld mutates its input in place
        # (pointpillars.py:126-131 writes through a view) and
        # from_numpy shares memory with the numpy buffer
        ref_out = tref(
            torch.from_numpy(voxels.copy()),
            torch.from_numpy(counts.astype(np.int64)),
            torch.from_numpy(coords.astype(np.float32))).numpy()

    mine = get_vfe_class(cls_name)(**kwargs)
    variables = mine.init(
        jax.random.PRNGKey(0), jnp.asarray(voxels)[None],
        jnp.asarray(counts.astype(np.int32))[None],
        jnp.asarray(coords[:, 1:].astype(np.int32))[None])
    variables = jax.tree_util.tree_map(np.asarray, variables)
    params = ci._flatten(variables["params"])
    stats = ci._flatten(variables["batch_stats"])
    asg = ci._Assign(dict(params), dict(stats))
    sd = {f"voxel_feature_extractor.{k}": v
          for k, v in tref.state_dict().items()}
    # our VFE paths start at the module root here (no wrapping model)
    renamed_params = {("voxel_feature_extractor",) + p: v
                      for p, v in params.items()}
    renamed_stats = {("voxel_feature_extractor",) + p: v
                     for p, v in stats.items()}
    asg = ci._Assign(dict(renamed_params), dict(renamed_stats))
    ci._map_vfe(asg, sd)
    assert not asg.missing, asg.missing
    new_vars = {
        "params": ci._unflatten(asg.params)["voxel_feature_extractor"],
        "batch_stats": ci._unflatten(asg.stats)["voxel_feature_extractor"],
    }
    my_out = mine.apply(
        new_vars, jnp.asarray(voxels)[None],
        jnp.asarray(counts.astype(np.int32))[None],
        jnp.asarray(coords[:, 1:].astype(np.int32))[None])
    np.testing.assert_allclose(
        np.asarray(my_out)[0], ref_out, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("cls_name", ["VoxelFeatureExtractor",
                                      "VoxelFeatureExtractorV2"])
def test_vfe_import_golden(cls_name):
    """Reference VFE weights imported into ours reproduce the voxel
    features (cluster decoration + VFELayer maxpool-concat stack)."""
    from reference_torch import REFERENCE_ROOT, install_stubs
    import os
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference tree absent")
    install_stubs()
    try:
        from second.pytorch.models import voxel_encoder as ref_ve
    except Exception:
        pytest.skip("reference tree not importable")

    from second_tpu.models.registry import get_vfe_class

    kwargs = dict(num_input_features=4, use_norm=True,
                  num_filters=[16, 32], with_distance=False)
    tref = getattr(ref_ve, cls_name)(**kwargs)
    tref.eval()
    for m in tref.modules():
        if hasattr(m, "running_mean"):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.8, 1.2)

    rng = np.random.RandomState(6)
    V, T = 30, 10
    counts = rng.randint(1, T + 1, V)
    voxels = np.zeros((V, T, 4), np.float32)
    for i in range(V):
        voxels[i, :counts[i]] = rng.randn(counts[i], 4)
    coords = np.zeros((V, 3), np.int32)

    with torch.no_grad():
        ref_out = tref(
            torch.from_numpy(voxels.copy()),
            torch.from_numpy(counts.astype(np.int64)),
            None).numpy()

    mine = get_vfe_class(cls_name)(
        num_input_features=4, use_norm=True, num_filters=(16, 32),
        with_distance=False)
    variables = mine.init(
        jax.random.PRNGKey(0), jnp.asarray(voxels)[None],
        jnp.asarray(counts.astype(np.int32))[None],
        jnp.asarray(coords)[None])
    variables = jax.tree_util.tree_map(np.asarray, variables)
    params = {("voxel_feature_extractor",) + p: v
              for p, v in ci._flatten(variables["params"]).items()}
    stats = {("voxel_feature_extractor",) + p: v
             for p, v in ci._flatten(variables["batch_stats"]).items()}
    asg = ci._Assign(dict(params), dict(stats))
    sd = {f"voxel_feature_extractor.{k}": v
          for k, v in tref.state_dict().items()}
    ci._map_vfe(asg, sd)
    assert not asg.missing, asg.missing
    new_vars = {
        "params": ci._unflatten(asg.params)["voxel_feature_extractor"],
        "batch_stats": ci._unflatten(asg.stats)["voxel_feature_extractor"],
    }
    my_out = mine.apply(
        new_vars, jnp.asarray(voxels)[None],
        jnp.asarray(counts.astype(np.int32))[None],
        jnp.asarray(coords)[None])
    np.testing.assert_allclose(
        np.asarray(my_out)[0], ref_out, atol=2e-3, rtol=1e-3)
