#!/bin/bash
# Independent-witness harness: runs the from-scratch stdlib-Python
# Iceberg reader (ice_independent_read.py) over every fixture that
# `sbt "Test/runMain graft.DriveIceExport"` builds under
# /tmp/ind_export_*, printing one line per fixture to compare against
# the driver's EXPECT lines. Byte-identical output = witness pass.
cd "$(dirname "$0")/.."
base='SELECT COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) FROM T'
for f in plain mor bucket posdel appended dml branch posdml merge catname avrodata dv dvexport; do
  echo -n "WITNESS $f "
  python3 tools/ice_independent_read.py /tmp/ind_export_$f "$base" 2>/dev/null | tail -1
done
echo -n "WITNESS evolved "
python3 tools/ice_independent_read.py /tmp/ind_export_evolved "SELECT COUNT(*), CAST(SUM(CAST(price AS DECIMAL(18,2))) AS VARCHAR), COUNT(note) FROM T" 2>/dev/null | tail -1
for f in partitioned scoped; do
  echo -n "WITNESS $f "
  python3 tools/ice_independent_read.py /tmp/ind_export_$f "SELECT COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR), SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) FROM T" 2>/dev/null | tail -1
done
echo -n "WITNESS adopted "
python3 tools/ice_independent_read.py /tmp/ind_export_adopted "SELECT COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR), COUNT(DISTINCT sys_file_date) FROM T" 2>/dev/null | tail -1
echo -n "WITNESS changes "
python3 tools/ice_independent_read.py /tmp/ind_export_changes --changes 1 "SELECT _change_type, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) FROM t GROUP BY 1 ORDER BY 1" 2>/dev/null | tr '\n' ' '; echo
echo -n "WITNESS rowlineage "
python3 tools/ice_independent_read.py /tmp/ind_export_rowlineage --lineage "SELECT COALESCE(_last_updated_sequence_number, 0) AS seq, COUNT(*), SUM(_row_id), MIN(_row_id), MAX(_row_id) FROM t GROUP BY 1 ORDER BY 1" 2>/dev/null | tr '\n' ' '; echo
