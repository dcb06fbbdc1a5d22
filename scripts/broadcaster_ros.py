#!/usr/bin/env python
"""ROS node — the reference ``scripts/broadcaster_ros.py``: subscribes
an image topic, runs TfPoseEstimator inference, publishes
``tfpose_tpu_ros/Persons`` on ``/pose_estimator/pose``.

Requires a ROS environment (rospy + cv_bridge + the catkin-built
``tfpose_tpu_ros`` messages from ``ros/``). The development sandbox
has none, so this node import-gates rospy with a pointer to the
transport twin (``scripts/broadcaster.py`` on the TCP PoseService),
which serves the identical Persons schema and is what the test suite
exercises (tests/test_serving.py, tests/test_ros_pkg.py).
"""

import argparse
import logging
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("broadcaster_ros")


def make_callback(estimator, publisher, persons_cls, person_cls,
                  bodypart_cls, bridge, resize_out_ratio):
    """Build the image-topic callback (factored for testability:
    message classes are injected, so the schema mapping is testable
    without rospy)."""

    def callback(image_msg):
        image = bridge.imgmsg_to_cv2(image_msg, "bgr8")
        humans = estimator.inference(
            image, resize_to_default=True,
            upsample_size=resize_out_ratio)
        msg = persons_cls()
        for human in humans:
            person = person_cls()
            for bp in human.body_parts.values():
                elm = bodypart_cls()
                elm.part_id = bp.part_idx
                elm.x = bp.x
                elm.y = bp.y
                elm.confidence = bp.score
                person.body_part.append(elm)
            msg.persons.append(person)
        msg.image_w = image.shape[1]
        msg.image_h = image.shape[0]
        msg.header = image_msg.header
        publisher.publish(msg)

    return callback


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="TfPoseEstimator ROS broadcaster")
    parser.add_argument("--camera", type=str,
                        default="/videofile/image_raw")
    parser.add_argument("--model", type=str, default="mobilenet_thin")
    parser.add_argument("--resolution", type=str, default="432x368")
    parser.add_argument("--resize-out-ratio", type=float, default=4.0)
    args, _ = parser.parse_known_args(argv)

    try:
        import rospy
        from cv_bridge import CvBridge
        from sensor_msgs.msg import Image
        from tfpose_tpu_ros.msg import BodyPartElm, Person, Persons
    except ImportError:
        raise SystemExit(
            "rospy / tfpose_tpu_ros messages not available — this node "
            "needs a catkin workspace built from ros/. Outside ROS, use "
            "the TCP transport twin: scripts/broadcaster.py (server) + "
            "tfpose_tpu.serving.PoseClient / scripts/visualization.py "
            "(clients), same Persons schema.")

    from tfpose_tpu.estimator import TfPoseEstimator
    from tfpose_tpu.models import model_wh

    rospy.init_node("TfPoseEstimatorROS", anonymous=True)
    # rosparams override CLI defaults, reference-style
    camera = rospy.get_param("~camera", args.camera)
    model = rospy.get_param("~model", args.model)
    resolution = rospy.get_param("~resolution", args.resolution)
    ratio = rospy.get_param("~resize_out_ratio", args.resize_out_ratio)

    w, h = model_wh(resolution)
    estimator = TfPoseEstimator(model, target_size=(w, h))
    pub = rospy.Publisher("/pose_estimator/pose", Persons,
                          queue_size=1)
    callback = make_callback(estimator, pub, Persons, Person,
                             BodyPartElm, CvBridge(), ratio)
    rospy.Subscriber(camera, Image, callback, queue_size=1,
                     buff_size=2 ** 24)
    logger.info("broadcasting %s poses from %s", model, camera)
    rospy.spin()


if __name__ == "__main__":
    main()
