from linevis_tpu.loaders.obj_loader import load_trajectories_from_obj  # noqa: F401
from linevis_tpu.loaders.binlines import (  # noqa: F401
    load_trajectories_from_binlines,
    save_trajectories_as_binlines,
)
from linevis_tpu.loaders.stress_dat import load_stress_trajectories_from_dat_v1  # noqa: F401
from linevis_tpu.loaders.dataset_list import DataSetInformation, load_dataset_list  # noqa: F401
from linevis_tpu.loaders.flow_file import load_flow_trajectories_from_file  # noqa: F401
