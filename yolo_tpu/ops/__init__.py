from yolo_tpu.ops.math import sigmoid, inv_sigmoid  # noqa: F401
from yolo_tpu.ops.boxes import (  # noqa: F401
    iou_ltrb,
    yxhw_to_ltrb,
    ltrb_to_yxhw,
    GridTables,
    make_grid_tables,
    anchor_ltrb_table,
)
from yolo_tpu.ops.geometry import (  # noqa: F401
    CameraIntrinsics,
    PlateProjector,
    homography_from_4pts,
    warp_perspective,
    warp_affine,
)
