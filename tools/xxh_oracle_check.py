#!/usr/bin/env python3
"""Validate the XxHashMacros DuckDB replay against Spark's xxhash64.

Extracts the CREATE MACRO preamble from XxHashMacros.scala, generates
reference values with pyspark (local), and compares value-exactly across
string lengths 0-100 (all tail phases + stripe loop + multi-byte UTF-8)
and int/long/negative seed chains.

Usage: python3 tools/xxh_oracle_check.py
"""
import re, sys

def macros():
    src = open('src/main/scala/graft/entries/XxHashMacros.scala').read()
    return re.search(r'val Sql: String = """(.*?)"""', src, re.S).group(1)

def spark_ref():
    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master('local[2]')
             .config('spark.ui.enabled', 'false').getOrCreate())
    strs = ['', 'a', 'ab', 'abc', 'abcd', 'abcde', 'abcdefg', 'abcdefgh',
            'abcdefghi', 'hello world foo', '0123456789012345',
            '01234567890123456789012345678901',
            '012345678901234567890123456789012',
            'x'*31, 'x'*40, 'x'*63, 'x'*64, 'x'*65, 'x'*100,
            'héllo wörld ünïcode']
    df = spark.createDataFrame([(s,) for s in strs], ['s'])
    rows = df.select('s', F.xxhash64('s').alias('h1'),
                     F.xxhash64(F.lit(3), F.col('s')).alias('hi'),
                     F.xxhash64(F.lit(7).cast('long'), F.col('s')).alias('hl'),
                     F.xxhash64(F.lit(-12345678901).cast('long'),
                                F.col('s')).alias('hn')).collect()
    pairs = [(0, 0), (42, 43), (-1, -2), (2**62, -2**62),
             (123456789123456789, -987654321987654321)]
    prows = (spark.createDataFrame(pairs, ['a', 'b'])
             .select('a', 'b', F.xxhash64('a', 'b').alias('h')).collect())
    spark.stop()
    return rows, prows

def main():
    import duckdb
    con = duckdb.connect()
    for stmt in macros().split(';'):
        if stmt.strip():
            con.execute(stmt)
    rows, prows = spark_ref()
    bad = 0
    for r in rows:
        for q, want in [("SELECT xx_str(?, 42)", r['h1']),
                        ("SELECT xx_signed(xx_strh(?, xx_int(3, 42)))", r['hi']),
                        ("SELECT xx_signed(xx_strh(?, xx_long(7, 42)))", r['hl']),
                        ("SELECT xx_signed(xx_strh(?, xx_long(-12345678901, 42)))", r['hn'])]:
            got = con.execute(q, [r['s']]).fetchone()[0]
            if got != want:
                print('MISMATCH', repr(r['s']), q, got, want)
                bad += 1
    for r in prows:
        got = con.execute("SELECT xx_signed(xx_long(?, xx_long(?, 42)))",
                          [r['b'], r['a']]).fetchone()[0]
        if got != r['h']:
            print('MISMATCH pair', r['a'], r['b'], got, r['h'])
            bad += 1
    print('mismatches:', bad)
    sys.exit(1 if bad else 0)

if __name__ == '__main__':
    main()
