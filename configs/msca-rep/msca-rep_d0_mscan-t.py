_base_ = ["./msca-rep_d0_fix_mscan-t.py"]
app = dict(type="MscaRep", decomp=0, fix=False)
