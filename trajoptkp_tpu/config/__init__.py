from .loader import (GeneralConfig, SceneSpec, read_general_config,  # noqa: F401
                     apply_task_config, load_scene_csv, save_scene_csv,
                     apply_scene, make_task, register_task, available_tasks)
