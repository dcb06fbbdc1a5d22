"""ROS binding package (reference msgs/ + launch/ + CMakeLists.txt +
scripts/broadcaster_ros.py): msg-schema consistency with the serving
dataclasses, manifest well-formedness, and the node's callback logic
(exercised with injected message stubs — no rospy in the sandbox)."""

import dataclasses
import re
import sys
import xml.etree.ElementTree as ET

import numpy as np

sys.path.insert(0, "/root/repo")

ROS_DIR = "/root/repo/ros"


def parse_msg(path):
    """.msg -> list of (type, field) pairs, comments stripped."""
    fields = []
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if line:
                t, name = line.split()
                fields.append((t, name))
    return fields


def test_msg_schemas_match_serving_dataclasses():
    """The catkin messages and serving.messages must stay one schema
    (the TCP service is the transport twin of the ROS node)."""
    from tfpose_tpu.serving import messages

    bp = parse_msg(f"{ROS_DIR}/msgs/BodyPartElm.msg")
    assert [n for _, n in bp] == [
        f.name for f in dataclasses.fields(messages.BodyPartElm)]
    assert [t for t, _ in bp] == ["int32", "float32", "float32",
                                  "float32"]

    person = parse_msg(f"{ROS_DIR}/msgs/Person.msg")
    assert person == [("BodyPartElm[]", "body_part")]

    persons = parse_msg(f"{ROS_DIR}/msgs/Persons.msg")
    names = [n for _, n in persons]
    assert names == ["persons", "image_w", "image_h", "header"]
    assert dict(persons)["Person[]"] == "persons"


def test_package_manifest_and_cmake():
    root = ET.parse(f"{ROS_DIR}/package.xml").getroot()
    assert root.tag == "package"
    assert root.find("name").text == "tfpose_tpu_ros"
    deps = [d.text for d in root.iter() if d.tag.endswith("_depend")]
    assert "message_generation" in deps and "rospy" in deps

    cmake = open(f"{ROS_DIR}/CMakeLists.txt").read()
    for msg in ("BodyPartElm.msg", "Person.msg", "Persons.msg"):
        assert msg in cmake, f"{msg} not registered in CMakeLists"
    assert "generate_messages" in cmake
    assert "broadcaster_ros.py" in cmake

    launch = ET.parse(f"{ROS_DIR}/launch/demo_video.launch").getroot()
    node_types = [n.get("type") for n in launch.iter("node")]
    assert "broadcaster_ros.py" in node_types
    assert "visualization.py" in node_types


class _Stub:
    """Attribute bag standing in for a genpy message instance."""

    def __init__(self):
        self.body_part = []
        self.persons = []


class _Publisher:
    def __init__(self):
        self.published = []

    def publish(self, msg):
        self.published.append(msg)


class _Bridge:
    def imgmsg_to_cv2(self, msg, _enc):
        return msg.image


def test_broadcaster_callback_maps_humans_to_msg():
    sys.path.insert(0, "/root/repo/scripts")
    import broadcaster_ros

    from tfpose_tpu.core.types import BodyPart, Human

    human = Human()
    human.body_parts[0] = BodyPart("0-0", 0, 0.25, 0.5, 0.9)
    human.body_parts[4] = BodyPart("0-4", 4, 0.75, 0.1, 0.8)

    class _Estimator:
        def inference(self, image, resize_to_default, upsample_size):
            assert image.shape == (8, 6, 3)
            assert resize_to_default and upsample_size == 4.0
            return [human]

    class _ImageMsg:
        image = np.zeros((8, 6, 3), np.uint8)
        header = "frame-7"

    pub = _Publisher()
    cb = broadcaster_ros.make_callback(
        _Estimator(), pub, _Stub, _Stub, _Stub, _Bridge(), 4.0)
    cb(_ImageMsg())

    assert len(pub.published) == 1
    msg = pub.published[0]
    assert (msg.image_w, msg.image_h) == (6, 8)
    assert msg.header == "frame-7"
    assert len(msg.persons) == 1
    parts = msg.persons[0].body_part
    assert [(p.part_id, p.x, p.y, p.confidence) for p in parts] == [
        (0, 0.25, 0.5, 0.9), (4, 0.75, 0.1, 0.8)]


def test_broadcaster_main_gates_on_rospy():
    import pytest

    sys.path.insert(0, "/root/repo/scripts")
    import broadcaster_ros

    with pytest.raises(SystemExit, match="broadcaster.py"):
        broadcaster_ros.main([])
