_base_ = ["./msca-profile_mscan-t.py"]

app = dict(_cover_=True, type="MscaRepProfile", decomp=3, fix=True)
