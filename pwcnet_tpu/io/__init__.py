from pwcnet_tpu.io.flow_io import (  # noqa: F401
    load_flow,
    save_flow,
    read_flo,
    write_flo,
    read_pfm,
    write_pfm,
    read_kitti_png,
    write_kitti_png,
)
from pwcnet_tpu.io.vis import flow_to_rgb, vis_flow, make_color_wheel  # noqa: F401
