# Mirror of the reference's configs/msca-rep/msca-rep_d1_mscan-t.py:
# decomp=1 WITHOUT the border fix — the fix-ablation config
# (doc/msca-rep: d1 drops accuracy without fix; d1+fix is lossless).
_base_ = ["./msca-rep_d1_fix_mscan-t.py"]

app = dict(fix=False)
