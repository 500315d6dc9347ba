"""Golden-parse tests for the cfg parser + graph lowering (SURVEY.md §4.1):
block counts, channel arithmetic through route/shortcut, anchor/mask
resolution, head strides and detection counts for all three shipped variants.
"""
import pytest

from yolov3_tpu.config import parse_config, parse_config_text, net_options
from yolov3_tpu.graph import load_graph, lower


def test_parse_yolov3_block_census(cfg_paths):
    blocks = parse_config(cfg_paths["yolov3"])
    assert blocks[0]["type"] == "net"
    kinds = [b["type"] for b in blocks[1:]]
    assert len(kinds) == 107
    assert kinds.count("convolutional") == 75
    assert kinds.count("shortcut") == 23
    assert kinds.count("route") == 4
    assert kinds.count("upsample") == 2
    assert kinds.count("yolo") == 3


def test_parse_tiny_block_census(cfg_paths):
    blocks = parse_config(cfg_paths["yolov3-tiny"])
    kinds = [b["type"] for b in blocks[1:]]
    assert len(kinds) == 24
    assert kinds.count("convolutional") == 13
    assert kinds.count("maxpool") == 6
    assert kinds.count("yolo") == 2


def test_parse_spp_block_census(cfg_paths):
    blocks = parse_config(cfg_paths["yolov3-spp"])
    kinds = [b["type"] for b in blocks[1:]]
    assert len(kinds) == 114
    assert kinds.count("maxpool") == 3
    assert kinds.count("route") == 7  # 2 SPP-internal + 4-way + 4 head routes
    assert kinds.count("convolutional") == 76  # yolov3's 75 + post-SPP 1x1


def test_value_coercion():
    blocks = parse_config_text(
        "[net]\nwidth=416\nmomentum=0.9\npolicy=steps\n"
        "[yolo]\nmask = 0,1,2\nanchors = 10,13,  16,30\nignore_thresh = .7\n"
    )
    net = net_options(blocks)
    assert net["width"] == 416 and isinstance(net["width"], int)
    assert net["momentum"] == pytest.approx(0.9)
    assert net["policy"] == "steps"
    assert blocks[1]["mask"] == [0, 1, 2]
    assert blocks[1]["anchors"] == [10, 13, 16, 30]
    assert blocks[1]["ignore_thresh"] == pytest.approx(0.7)


def test_yolov3_graph_channels_and_strides(cfg_paths):
    g = load_graph(cfg_paths["yolov3"])
    assert (g.in_height, g.in_width, g.in_channels) == (416, 416, 3)
    # Darknet-53 stage boundaries
    assert g.nodes[0].out_channels == 32
    assert g.nodes[4].kind == "shortcut" and g.nodes[4].out_channels == 64
    assert g.nodes[36].out_channels == 256 and g.nodes[36].downsample == 8
    assert g.nodes[61].out_channels == 512 and g.nodes[61].downsample == 16
    assert g.nodes[74].out_channels == 1024 and g.nodes[74].downsample == 32
    # route -1,61 concat: 256 (upsampled head) + 512 (backbone)
    assert g.nodes[86].kind == "route" and g.nodes[86].out_channels == 768
    assert g.nodes[86].inputs == (85, 61)
    assert g.nodes[98].kind == "route" and g.nodes[98].out_channels == 384
    assert g.nodes[98].inputs == (97, 36)
    # head convs are linear 255 with no BN
    for i in (81, 93, 105):
        n = g.nodes[i]
        assert n.out_channels == 255 and not n.batch_normalize
        assert n.activation == "linear"
    assert g.head_strides() == (32, 16, 8)


def test_yolov3_anchor_resolution(cfg_paths):
    g = load_graph(cfg_paths["yolov3"])
    heads = g.yolo_nodes
    assert [n.classes for n in heads] == [80, 80, 80]
    assert heads[0].anchors == ((116, 90), (156, 198), (373, 326))
    assert heads[1].anchors == ((30, 61), (62, 45), (59, 119))
    assert heads[2].anchors == ((10, 13), (16, 30), (33, 23))


@pytest.mark.parametrize("name,size,expected", [
    ("yolov3", 416, 10647),       # 3*(13²+26²+52²)
    ("yolov3", 608, 22743),       # 3*(19²+38²+76²)
    ("yolov3", 320, 6300),        # 3*(10²+20²+40²)
    ("yolov3-tiny", 416, 2535),   # 3*(13²+26²)
    ("yolov3-spp", 608, 22743),
])
def test_detection_counts(cfg_paths, name, size, expected):
    g = load_graph(cfg_paths[name])
    assert g.num_detections(size, size) == expected


def test_tiny_stride1_maxpool(cfg_paths):
    g = load_graph(cfg_paths["yolov3-tiny"])
    mp = [n for n in g.nodes if n.kind == "maxpool"]
    assert [n.stride for n in mp] == [2, 2, 2, 2, 2, 1]
    # stride-1 size-2 pool: darknet pads 0 low / 1 high (asymmetric)
    assert mp[-1].padding == 1
    assert g.head_strides() == (32, 16)


def test_spp_four_way_route(cfg_paths):
    g = load_graph(cfg_paths["yolov3-spp"])
    four_way = [n for n in g.nodes if n.kind == "route" and len(n.inputs) == 4]
    assert len(four_way) == 1
    n = four_way[0]
    assert n.out_channels == 2048  # 4 × 512
    # SPP maxpools keep spatial dims: 5/9/13 kernels, stride 1
    sizes = sorted(g.nodes[i].size for i in n.inputs if g.nodes[i].kind == "maxpool")
    assert sizes == [5, 9, 13]
    assert all(g.nodes[i].downsample == 32 for i in n.inputs)


def test_parser_fuzz_never_crashes():
    """Arbitrary garbage must raise ValueError (or parse), never crash."""
    import random

    rnd = random.Random(0)
    corpus = ["[net]", "width=416", "layers=-1,61", "###", "= =", "[", "]",
              "[yolo]", "anchors=1,2", "\x00\x01", "a" * 200, "=5", "k="]
    for _ in range(200):
        text = "\n".join(rnd.choice(corpus)
                         for _ in range(rnd.randrange(0, 12)))
        try:
            parse_config_text(text)
        except ValueError:
            pass  # expected for malformed inputs


def test_lower_rejects_bad_graphs():
    with pytest.raises(ValueError, match="channel mismatch"):
        lower(parse_config_text(
            "[net]\nchannels=3\n"
            "[convolutional]\nfilters=8\nsize=3\nstride=1\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=16\nsize=3\nstride=1\npad=1\nactivation=leaky\n"
            "[shortcut]\nfrom=-2\nactivation=linear\n"
        ))
    with pytest.raises(ValueError, match="out of range"):
        lower(parse_config_text(
            "[net]\nchannels=3\n"
            "[convolutional]\nfilters=8\nsize=3\nstride=1\npad=1\nactivation=leaky\n"
            "[route]\nlayers=-5\n"
        ))


def test_shipped_cfgs_match_generator(tmp_path, models_dir):
    """models/*.cfg must stay in sync with tools/gen_cfgs.py (the generator
    is the source of truth; drift means silently divergent architectures)."""
    import os
    import subprocess
    import sys

    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(models_dir), "tools",
                                 "gen_cfgs.py"), str(tmp_path)], check=True)
    for name in ("yolov3.cfg", "yolov3-tiny.cfg", "yolov3-spp.cfg",
                 "coco.names"):
        fresh = (tmp_path / name).read_text()
        shipped = open(os.path.join(models_dir, name)).read()
        assert fresh == shipped, f"{name} drifted from tools/gen_cfgs.py"


def test_bom_and_crlf_cfg():
    """Windows-edited cfgs: UTF-8 BOM + CRLF line endings parse cleanly."""
    text = "﻿[net]\r\nwidth=416\r\nheight=416\r\n\r\n[convolutional]\r\nfilters=8\r\nsize=3\r\nstride=1\r\npad=1\r\nactivation=leaky\r\n"
    blocks = parse_config_text(text)
    assert blocks[0]["type"] == "net" and blocks[0]["width"] == 416
    assert blocks[1]["filters"] == 8


def test_summary_table(cfg_paths):
    g = load_graph(cfg_paths["yolov3"])
    s = g.summary()
    lines = s.splitlines()
    assert len(lines) == 2 + 107
    assert "13x13x255" in s and "26x26x255" in s and "52x52x255" in s
    # at 608 the head grids scale
    assert "19x19x255" in g.summary(608, 608)


def test_needed_outputs_is_sparse(cfg_paths):
    g = load_graph(cfg_paths["yolov3"])
    needed = g.needed_outputs
    # far fewer than all 107 layers should be retained during the walk
    assert len(needed) < 60
    assert 61 in needed and 36 in needed  # backbone route targets
