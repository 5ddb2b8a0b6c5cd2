"""Config/CLI surface tests (the reference's train_imagenet flag contract)."""

import pytest

from resnet_tpu.config import (PRESETS, Config, build_parser,
                               config_from_args, parse_config)


class TestCLI:
    def test_reference_flag_surface(self):
        cfg = parse_config([
            "--network", "resnext", "--depth", "101", "--batch-size", "512",
            "--lr", "0.2", "--lr-steps", "30,60,90", "--wd", "2e-4",
            "--mom", "0.95", "--num-epochs", "120", "--frequent", "100",
            "--model-prefix", "ck/model", "--load-epoch", "7",
            "--num-devices", "16", "--dp-mode", "shard_map",
            "--dtype", "bfloat16", "--remat"])
        assert cfg.model.network == "resnext" and cfg.model.depth == 101
        assert cfg.train.batch_size == 512
        assert cfg.train.lr == pytest.approx(0.2)
        assert cfg.train.lr_steps == (30, 60, 90)
        assert cfg.train.wd == pytest.approx(2e-4)
        assert cfg.train.mom == pytest.approx(0.95)
        assert cfg.train.num_epochs == 120
        assert cfg.train.frequent == 100
        assert cfg.train.model_prefix == "ck/model"
        assert cfg.train.load_epoch == 7
        assert cfg.train.num_devices == 16
        assert cfg.train.dp_mode == "shard_map"
        assert cfg.train.dtype == "bfloat16"
        assert cfg.train.remat is True

    def test_defaults_match_reference_recipe(self):
        cfg = Config()
        assert cfg.train.lr == pytest.approx(0.1)
        assert cfg.train.lr_steps == (30, 60, 90)
        assert cfg.train.mom == pytest.approx(0.9)
        assert cfg.train.wd == pytest.approx(1e-4)
        assert cfg.data.num_examples == 1281167
        assert cfg.data.num_classes == 1000
        assert cfg.model.bn_mom == pytest.approx(0.9)
        assert cfg.model.bn_eps == pytest.approx(2e-5)

    def test_presets_cover_baseline_configs(self):
        assert set(PRESETS) == {
            "cifar10_resnet18", "imagenet_resnet50", "imagenet_resnext50",
            "imagenet_resnet101_bf16", "imagenet_resnet152_dp"}
        # shipped execution recipe (PERF_NOTES rounds 3c/3d): every
        # ImageNet preset runs bn-ema; R50 additionally ships the bs128
        # batch optimum with linearly scaled lr (0.1-per-256 rule)
        p2 = PRESETS["imagenet_resnet50"]()
        assert p2.train.bn_ema
        assert p2.train.batch_size == 128
        assert p2.train.lr == pytest.approx(0.05)
        # round 3f/3g execution schedule (K refined to 6 in round 3k):
        # unrolled 6-step dispatch + space-to-depth stem (both
        # math-preserving; PERF_NOTES.md)
        assert p2.train.steps_per_dispatch == 6 and p2.train.spd_unroll
        assert p2.train.stem_s2d
        # round 4a: augmenter emits space-to-depth blocks straight into
        # the pre-blocked stem (PERF_NOTES round 4a — 3008.6 img/s)
        assert p2.train.aug_s2d
        assert p2.train.dtype == "bfloat16"
        # round-5 family batch sweep: the bs128 MXU-lane optimum ships
        # family-wide (ResNeXt 1950.0, R101 2029.8, R152 1464.7 — each
        # at 128/chip with linear-scaled lr; PERF_NOTES round 5)
        p3 = PRESETS["imagenet_resnext50"]()
        assert p3.train.bn_ema and p3.train.batch_size == 128
        assert p3.train.lr == pytest.approx(0.05)
        p4 = PRESETS["imagenet_resnet101_bf16"]()
        assert p4.train.dtype == "bfloat16" and p4.train.warmup
        assert p4.train.bn_ema
        assert p4.train.batch_size == 1024   # already 128/chip x 8
        p5 = PRESETS["imagenet_resnet152_dp"]()
        assert p5.model.depth == 152 and p5.train.remat
        assert p5.train.num_devices == 16
        assert p5.train.bn_ema
        assert p5.train.batch_size == 2048   # 128/chip x 16 (round 5)
        assert p5.train.lr == pytest.approx(0.8)
        # round 4: the whole ImageNet family ships one augmenter-boundary
        # layout (aug_s2d — never negative, PERF_NOTES family refresh)
        assert p3.train.aug_s2d and p4.train.aug_s2d and p5.train.aug_s2d

    def test_preset_with_overrides(self):
        cfg = parse_config(["--preset", "cifar10_resnet18",
                            "--batch-size", "64", "--lr", "0.01"])
        assert cfg.model.dataset == "cifar10"
        assert cfg.train.batch_size == 64
        assert cfg.train.lr == pytest.approx(0.01)
        # untouched preset values survive
        assert cfg.train.lr_steps == (120, 160)

    def test_nag_wires_into_optimizer(self):
        cfg = parse_config(["--preset", "cifar10_resnet18", "--depth", "20",
                            "--optimizer", "nag"])
        assert cfg.train.optimizer == "nag"

    def test_image_shape_parse(self):
        cfg = parse_config(["--image-shape", "224,224,3"])
        assert cfg.data.image_shape == (224, 224, 3)
