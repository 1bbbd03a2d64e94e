"""Pipeline stages: bronze→silver→gold re-expressions of the reference's
STEP 1/2/4/5 as single declarative DataFrame chains."""
