_base_ = ["./msca-profile_mscan-t.py", "../../_base_/models/mscan/mscan-s.py"]
