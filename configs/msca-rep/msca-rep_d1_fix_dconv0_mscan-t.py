_base_ = ["./msca-rep_d1_fix_mscan-t.py"]

# extension: also rank-1-decompose conv0 (25 -> 10 taps)
app = dict(type="MscaRep", decomp=1, fix=True, decomp_conv0=True, _cover_=True)
