_base_ = ["./dummy_mscan-s_fps.py"]

app = dict(_cover_=True, type="MscaRep", decomp=1, fix=False)
