"""``tf_pose`` — drop-in import-compatibility package.

Lets code written against the reference project run unchanged on the
TPU-native framework:

    from tf_pose.estimator import TfPoseEstimator
    from tf_pose.networks import get_graph_path, model_wh
    from tf_pose import common
    import tf_pose; tf_pose.infer(image)

Everything forwards to ``tfpose_tpu``; the reference's frozen-graph
paths are accepted and resolved to model names / converted
checkpoints (see tf_pose/networks.py).
"""

from tf_pose.runner import infer  # noqa: F401

__all__ = ["infer"]
