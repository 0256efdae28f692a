import runpy, sys
sys.argv=[""]
exec(open("scratch/exp25.py").read().split('bench(32, 16, 48, 700, 8,  "L32 ctx700 ppc8")')[0])
bench(32, 64, 12, 700, 4,  "page64  ppc4 (new kernel)")
bench(32, 64, 12, 700, 2,  "page64  ppc2")
bench(32, 128, 6, 700, 2,  "page128 ppc2")
bench(32, 128, 6, 700, 1,  "page128 ppc1")
