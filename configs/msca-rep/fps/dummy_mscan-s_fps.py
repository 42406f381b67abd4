_base_ = ["../../_base_/models/mscan/mscan-s.py", "../../_base_/apps/dummy.py"]

filters = []

hooks = [dict(type="Fps", priority=50, repeat_times=3, dataset_args=dict(batch_size=64))]
