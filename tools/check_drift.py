#!/usr/bin/env python3
"""Doc-drift gate: diff SURVEY.md's §8 tallies against MEASURED numbers.

The tallies drift when written by hand (round 7 claimed "38 suites" while
the run completed 36; round 6 claimed a 2.3 s graph_kcore the driver
measured at 4.75 s). This check makes the claims mechanical:

  sbt -batch test 2>&1 | tee /tmp/test.log
  python3 tools/check_drift.py /tmp/test.log [verifyOutDir]

- test/suite counts come from the sbt summary lines;
- the declared-query count comes from verifyOutDir/oracle_sql.json (the
  same artifact the driver's gate reads) when given;
- SURVEY.md's "<T> green across <S> suites" and "<Q> declared queries"
  claims are greped and diffed. Exit 1 on any mismatch, printing the sed
  commands to fix them.
"""
import json, re, sys

log_path = sys.argv[1]
verify_out = sys.argv[2] if len(sys.argv) > 2 else None

log = open(log_path, errors="replace").read()
m_tests = re.findall(r"Total number of tests run: (\d+)", log)
m_suites = re.findall(r"Suites: completed (\d+)", log)
m_ok = re.findall(r"Tests: succeeded (\d+), failed (\d+)", log)
if not (m_tests and m_suites and m_ok):
    print("FAIL: no sbt test summary found in", log_path)
    sys.exit(1)
tests, suites = int(m_tests[-1]), int(m_suites[-1])
succeeded, failed = map(int, m_ok[-1])
if failed or succeeded != tests:
    print(f"FAIL: test run not green ({succeeded}/{tests}, {failed} failed)")
    sys.exit(1)

survey = open("SURVEY.md").read()
bad = []

claim = re.search(r"\((\d+) green across (\d+) suites\)", survey)
if not claim:
    bad.append("SURVEY.md: no '<T> green across <S> suites' claim found")
else:
    ct, cs = int(claim.group(1)), int(claim.group(2))
    if (ct, cs) != (tests, suites):
        bad.append(f"SURVEY.md claims '{ct} green across {cs} suites'; "
                   f"measured {tests} across {suites} — fix: "
                   f"s/{ct} green across {cs} suites/"
                   f"{tests} green across {suites} suites/")

if verify_out:
    nq = len(json.load(open(f"{verify_out}/oracle_sql.json")))
    qclaim = re.search(r"\*\*(\d+) declared queries", survey)
    if not qclaim:
        bad.append("SURVEY.md: no '<Q> declared queries' claim found")
    elif int(qclaim.group(1)) != nq:
        bad.append(f"SURVEY.md claims {qclaim.group(1)} declared queries; "
                   f"oracle_sql.json has {nq}")
    # the 'N/N green' pair should quote the same N
    for pair in re.findall(r"(\d+)/(\d+) green", survey[:3000]):
        if pair[0] != pair[1] or int(pair[1]) != nq:
            bad.append(f"SURVEY.md header quotes {pair[0]}/{pair[1]} green; "
                       f"oracle_sql.json has {nq}")

if bad:
    print("DOC DRIFT:")
    for b in bad:
        print(" -", b)
    sys.exit(1)
print(f"no drift: {tests} tests / {suites} suites"
      + (f" / {nq} queries" if verify_out else ""))
