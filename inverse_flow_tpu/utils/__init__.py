from .profiling import StepTimer, trace
from .imaging import filter_heatmap_grid, make_grid, save_image_grid, write_png

__all__ = ["StepTimer", "trace", "filter_heatmap_grid", "make_grid",
           "save_image_grid", "write_png"]
