"""Drop-in ``tf_pose`` package shim: reference user code must run."""

import numpy as np
import pytest


def test_reference_import_pattern():
    from tf_pose import common
    from tf_pose.estimator import TfPoseEstimator
    from tf_pose.networks import get_graph_path, model_wh

    assert common.CocoPart.Nose == 0
    assert len(common.CocoPairs) == 19
    w, h = model_wh("432x368")
    assert (w, h) == (432, 368)
    assert get_graph_path("mobilenet_thin").endswith("params.msgpack")
    with pytest.raises(ValueError):
        get_graph_path("nope")


def test_reference_run_py_flow():
    """The exact flow of the reference run.py main()."""
    from tf_pose import common
    from tf_pose.estimator import TfPoseEstimator
    from tf_pose.networks import get_graph_path, model_wh

    w, h = model_wh("96x80")
    # no reference weights can exist in this sandbox, so the artifact
    # path get_graph_path returns is absent -> opt into random init
    # (without the flag the ctor raises; see test below)
    e = TfPoseEstimator(get_graph_path("mobilenet_thin"),
                        target_size=(w, h), allow_random_init=True)
    image = np.random.default_rng(0).integers(
        0, 255, (120, 160, 3), np.uint8)
    humans = e.inference(image, resize_to_default=True,
                         upsample_size=4.0)
    image = TfPoseEstimator.draw_humans(image, humans, imgcopy=False)
    assert image.shape == (120, 160, 3)


def test_missing_artifact_path_fails_loudly():
    """A typo'd checkpoint path must raise, not silently run a
    random-init default network (the reference fails loudly too:
    tf.gfile.GFile raises on a bad graph path, estimator.py:~310)."""
    from tf_pose.estimator import TfPoseEstimator
    from tf_pose.networks import model_name_from_path

    with pytest.raises(FileNotFoundError):
        TfPoseEstimator("models/graph/mobilenet_thin/graph_op.pb",
                        target_size=(96, 80))  # typo'd filename
    # an uninferable path raises even with random init allowed
    with pytest.raises(ValueError):
        TfPoseEstimator("models/graph/mobilnet_thn/graph_opt.pb",
                        target_size=(96, 80), allow_random_init=True)
    with pytest.raises(ValueError):
        model_name_from_path("/tmp/nothing/here.pb")


def test_reference_ctor_extra_args_accepted():
    from tf_pose.estimator import TfPoseEstimator

    e = TfPoseEstimator("mobilenet_thin", target_size=(96, 80),
                        tf_config="ignored", trt_bool=True)
    assert e.target_size == (96, 80)


def test_runner_infer_shim():
    import tf_pose

    img = np.zeros((80, 96, 3), np.uint8)
    humans = tf_pose.infer(img, model="mobilenet_thin", resize="96x80")
    assert isinstance(humans, list)


def test_pafprocess_shim():
    pytest.importorskip("tfpose_tpu.oracle.cpp")
    from tf_pose import pafprocess

    peaks = np.zeros((46, 54, 19), np.float32)
    paf = np.zeros((46, 54, 38), np.float32)
    pafprocess.process_paf(peaks, peaks, paf)
    assert pafprocess.get_num_humans() == 0
