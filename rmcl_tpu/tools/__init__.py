"""Command-line entry points — the reference's L6 executable layer.

The reference registers every app as a ROS 2 component executable
(SURVEY.md §1 L6: micp_localization_node, rmcl_localization_node,
conv_* nodes, *_map_segmentation_* nodes — rmcl_ros/CMakeLists.txt:465+).
Here each is a ``python -m rmcl_tpu.tools.<name>`` program driven by a
YAML config (``config.tree.ParamTree``) and an NPZ message log
(``io.replay.MessageLog``) instead of DDS topics and TF:

    python -m rmcl_tpu.tools.micp_localization --map world.obj \
        --log run.npz --config micp.yaml --out track.npz
    python -m rmcl_tpu.tools.rmcl_localization --map world.obj \
        --log run.npz --global-box -5 -5 0 -3.14 0 0  5 5 2 3.14 0 0
    python -m rmcl_tpu.tools.map_segmentation --map world.obj --log run.npz
"""
