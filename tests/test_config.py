"""Config/CLI surface parity tests."""

import pytest

from vid2vid_tpu.config import Options, build_parser, parse_args

# every flag the reference exposes (options/base_options.py,
# train_options.py, test_options.py), minus pure-GPU plumbing that maps to
# mesh concepts but still parses (--gpu_ids, --n_gpus_gen kept for compat)
REFERENCE_TRAIN_FLAGS = [
    "--dataroot", "--batchSize", "--loadSize", "--fineSize", "--input_nc",
    "--label_nc", "--output_nc", "--netG", "--ngf", "--ndf", "--n_blocks",
    "--n_downsample_G", "--gpu_ids", "--n_gpus_gen", "--name",
    "--dataset_mode", "--model", "--nThreads", "--checkpoints_dir", "--norm",
    "--serial_batches", "--display_winsize", "--display_id", "--tf_log",
    "--max_dataset_size", "--resize_or_crop", "--no_flip", "--use_instance",
    "--label_feat", "--feat_num", "--nef", "--load_features", "--netE",
    "--n_downsample_E", "--n_blocks_local", "--n_local_enhancers",
    "--n_frames_G", "--n_scales_spatial", "--no_first_img", "--use_single_G",
    "--fg", "--fg_labels", "--no_flow", "--no_canny_edge", "--no_dist_map",
    "--random_scale_points", "--densepose_only", "--openpose_only",
    "--add_face_disc", "--remove_face_labels", "--random_drop_prob",
    "--basic_point_only", "--load_pretrain", "--debug", "--fp16",
    "--local_rank",
    # train options
    "--display_freq", "--print_freq", "--save_latest_freq",
    "--save_epoch_freq", "--continue_train", "--which_epoch", "--phase",
    "--niter", "--niter_decay", "--niter_step", "--niter_fix_global",
    "--beta1", "--lr", "--TTUR", "--gan_mode", "--pool_size", "--num_D",
    "--n_layers_D", "--no_vgg", "--no_ganFeat", "--lambda_feat", "--sparse_D",
    "--lambda_T", "--lambda_F", "--n_frames_D", "--n_scales_temporal",
    "--max_frames_per_gpu", "--max_frames_backpropagate", "--max_t_step",
    "--n_frames_total", "--no_html",
]
REFERENCE_TEST_FLAGS = [
    "--how_many", "--use_real_img", "--start_frame", "--results_dir",
    "--which_epoch", "--phase",
]


class TestFlagSurface:
    def test_all_reference_train_flags_exist(self):
        parser = build_parser(is_train=True)
        known = {
            opt for action in parser._actions for opt in action.option_strings
        }
        missing = [f for f in REFERENCE_TRAIN_FLAGS if f not in known]
        assert not missing, missing

    def test_all_reference_test_flags_exist(self):
        parser = build_parser(is_train=False)
        known = {
            opt for action in parser._actions for opt in action.option_strings
        }
        missing = [f for f in REFERENCE_TEST_FLAGS if f not in known]
        assert not missing, missing

    def test_reference_recipe_parses(self, tmp_path):
        # the reference's street train_512 recipe verbatim
        opt = parse_args(
            [
                "--name", "label2city_512", "--label_nc", "35",
                "--loadSize", "512", "--use_instance", "--fg",
                "--gpu_ids", "0,1,2,3,4,5,6,7", "--n_gpus_gen", "6",
                "--n_frames_total", "6", "--max_frames_per_gpu", "2",
                "--checkpoints_dir", str(tmp_path),
            ],
            is_train=True,
        )
        assert opt.label_nc == 35 and opt.use_instance and opt.fg
        assert opt.gpu_ids == (0, 1, 2, 3, 4, 5, 6, 7)
        assert opt.fg_labels == (26,)
        assert (tmp_path / "label2city_512" / "opt.txt").exists()

    def test_derived_properties(self):
        opt = Options(label_nc=35, use_instance=True)
        assert opt.gen_input_nc == 36
        opt = Options(label_nc=0, input_nc=6)
        assert opt.gen_input_nc == 6
        opt = Options(openpose_only=True)
        assert opt.effective_no_flow
        assert Options(ngf=128).ngf_at_scale(2) == 32


class TestRecipeMatrix:
    def test_every_recipe_parses(self, tmp_path):
        """All 30 recipes (the reference's full scripts/ matrix,
        reference: scripts/{street,face,pose}/*.sh) parse through the real
        CLI argument surface with their exact flag sets."""
        import glob
        import os
        import shlex

        root = os.path.join(os.path.dirname(__file__), "..", "recipes")
        recipes = sorted(glob.glob(os.path.join(root, "*", "*.sh")))
        assert len(recipes) == 30
        for path in recipes:
            text = open(path).read().replace("\\\n", " ")
            cmd = next(
                line for line in text.splitlines()
                if line.startswith("python -m vid2vid_tpu.")
            )
            toks = shlex.split(cmd)
            is_train = "train_cli" in toks[2]
            args = toks[3:] + ["--checkpoints_dir", str(tmp_path)]
            opt = parse_args(args, is_train=is_train, save=False)
            assert opt.name, path
            assert opt.isTrain == is_train, path

    def test_recipe_names_mirror_reference(self):
        import glob
        import os

        root = os.path.join(os.path.dirname(__file__), "..", "recipes")
        got = {
            os.path.join(os.path.basename(os.path.dirname(p)), os.path.basename(p))
            for p in glob.glob(os.path.join(root, "*", "*.sh"))
        }
        expected = {
            # street (reference: scripts/street/)
            "street/train_512.sh", "street/train_512_bs.sh",
            "street/train_512_no_fg.sh", "street/train_1024.sh",
            "street/train_2048.sh", "street/train_2048_crop.sh",
            "street/train_g1_256.sh", "street/train_g1_512.sh",
            "street/train_g1_1024.sh", "street/test_2048.sh",
            "street/test_g1_1024.sh",
            # face (reference: scripts/face/)
            "face/train_512.sh", "face/train_512_bs7.sh",
            "face/train_g1_256.sh", "face/train_g1_512.sh",
            "face/test_512.sh", "face/test_g1_256.sh", "face/test_g1_512.sh",
            # pose (reference: scripts/pose/)
            "pose/train_256p.sh", "pose/train_512p.sh", "pose/train_1024p.sh",
            "pose/train_g1_256p.sh", "pose/train_g1_512p.sh",
            "pose/train_g1_1024p.sh", "pose/test_256p.sh", "pose/test_512p.sh",
            "pose/test_1024p.sh", "pose/test_g1_256p.sh",
            "pose/test_g1_512p.sh", "pose/test_g1_1024p.sh",
        }
        assert got == expected
