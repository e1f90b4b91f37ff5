from dafne_tpu.geometry.quads import (
    sort_quadrilateral,
    quad_signed_area,
    quad_area,
    enclosing_hbox,
    point_to_line_distance,
    compute_abcd,
    is_in_quadrilateral,
    centerness_targets,
)
from dafne_tpu.geometry.iou import (
    quad_intersection_area,
    quad_intersection_area_clip,
    quad_iou,
    quad_iou_matrix,
)

__all__ = [
    "sort_quadrilateral",
    "quad_signed_area",
    "quad_area",
    "enclosing_hbox",
    "point_to_line_distance",
    "compute_abcd",
    "is_in_quadrilateral",
    "centerness_targets",
    "quad_intersection_area",
    "quad_intersection_area_clip",
    "quad_iou",
    "quad_iou_matrix",
]
