"""Verbatim THERMOCALC axfile ``sf`` blocks (X10 site-occupancy
self-check surface) for every solution phase in the three model sets.

These strings are PUBLIC THERMOCALC data (tc-mp50*/tc-mb50*/tc-ig50*
axfiles by Holland, Powell, Green, White, Weller et al.), identical by
nature to the transcriptions the reference carries in each phase file
(e.g. ``/root/reference/src/petropandas/hpxeos/metapelite/garnet.py``
``_SF_BLOCK``); the evaluation machinery is independent
(``hpxeos.add_site_occupancies`` compiles them to SQL expressions).
Regenerate with ``tools/extract_sf_blocks.py``.
"""

SF_BLOCKS: dict[str, dict[str, str]] = {
  'metapelite': {
    'mu': '''
xKA        1 1    1  2  -1  c  -1  n

xNaA       1 1    0  1  1  n

xCaA       1 1    0  1  1  c

xMgM2A     2 1    1  2  -1  x  -1  y
             2    0  1  1  x    0  1  1  y

xFeM2A     2 1    0  1   1  x
             2    0  1  -1  x    0  1  1  y

xAlM2A     1 1    0  1  1  y

xAlM2B     1 1    1  1  -1  f

xFe3M2B    1 1    0  1  1  f

xSiT1      1 1    1  2  -1/2  c  -1/2  y

xAlT1      1 1    0  2  1/2  c  1/2  y
''',
    'ma': '''
xKA        1 1    1  2  -1  c  -1  n
xNaA       1 1    0  1  1  n
xCaA       1 1    0  1  1  c
xMgM2A     2 1    1  2  -1  x  -1  y
             2    0  1  1  x    0  1  1  y
xFeM2A     2 1    0  1   1  x
             2    0  1  -1  x    0  1  1  y
xAlM2A     1 1    0  1  1  y
xAlM2B     1 1    1  1  -1  f
xFe3M2B    1 1    0  1  1  f
xSiT1      1 1    1  2  -1/2  c  -1/2  y
xAlT1      1 1    0  2  1/2  c  1/2  y
''',
    'ctd': '''
xAlM1A     1 1    1  1  -1  f

xFe3M1A    1 1    0  1  1  f

xFeM1B     2 1    0  1   1  x
             2    0  1  -1  m    0  1  1  x

xMgM1B     2 1    1  2  -1  m  -1  x
             2    0  1  1  m    0  1  1  x

xMnM1B     1 1    0  1  1  m
''',
    'cd': '''
xFeX       2 1    0  1   1  x
             2    0  1  -1  m    0  1  1  x

xMgX       2 1    1  2  -1  m  -1  x
             2    0  1  1  m    0  1  1  x

xMnX       1 1    0  1  1  m

xH2OH      1 1    0  1  1  h

xvH        1 1    1  1  -1  h
''',
    'st': '''
xMgX       2 1    1  2  -1  m  -1  x
             2    0  1  1  m    0  1  1  x

xFeX       2 1    0  1   1  x
             2    0  1  -1  m    0  1  1  x

xMnX       1 1    0  1  1  m

xAlY       1 1    1  2  -1  f  -4/3  t

xFe3Y      1 1    0  1  1  f

xTiY       1 1    0  1  1  t

xvY        1 1    0  1  1/3  t
''',
    'ep': '''
xFeM1   1  1    0  2  1  f  -1  Q
xAlM1   1  1    1  2 -1  f   1  Q
xFeM3   1  1    0  2  1  f   1  Q
xAlM3   1  1    1  2 -1  f  -1  Q
''',
    'pl4tr': '''
xNaA       1 1    1  2  -1  ca  -1  k
xCaA       1 1    0  1  1  ca
xKA        1 1    0  1  1  k
xAlTB      1 1    1/4  1  1/4  ca
xSiTB      1 1    3/4  1  -1/4  ca
''',
    'k4tr': '''
xNaA       1 1    0 1  1 na
xCaA       1 1    0 1  1 ca
xKA        1 1    1 2 -1 na -1 ca
xAlTB      1 1    1/4  1  1/4  ca
xSiTB      1 1    3/4  1  -1/4  ca
''',
    'opx': '''
xMgM1      6 1    1  5  1/2  Q  -1  f  -1  m  -1  x  -1  y
             2    0  1  -1/2  c    0  1  1  Q
             2    0  1  -1/2  m    0  1  1  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  1  m    0  1  1  x
             2    0  1  1  x    0  1  1  y

xFeM1      6 1    0  2  -1/2  Q   1  x
             2    0  1  1/2  c    0  1  1  Q
             2    0  1  1/2  m    0  1  1  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  m    0  1  1  x
             2    0  1  -1  x    0  1  1  y

xMnM1      1 1    0  1  1  m

xFe3M1     1 1    0  1  1  f

xAlM1      1 1    0  1  1  y

xMgM2      5 1    1  4  -1/2  Q  -1  c  -1  m  -1  x
             2    0  1  1/2  c    0  1  1  Q
             2    0  1  1/2  m    0  1  1  Q
             2    0  1  1  c    0  1  1  x
             2    0  1  1  m    0  1  1  x

xFeM2      5 1    0  2  1/2  Q   1  x
             2    0  1  -1/2  c    0  1  1  Q
             2    0  1  -1/2  m    0  1  1  Q
             2    0  1  -1  c    0  1  1  x
             2    0  1  -1  m    0  1  1  x

xMnM2      1 1    0  1  1  m

xCaM2      1 1    0  1  1  c

xSiT       1 1    1  2  -1/2  f  -1/2  y

xAlT       1 1    0  2  1/2  f  1/2  y
''',
    'ilm': '''
xFe2A  1 1    0  2  1/2  x  1/2  Q

xTiA   1 1    0  2  1/2  x -1/2  Q

xFe3A  1 1    1  1 -1  x

xFe2B  1 1    0  2  1/2  x -1/2  Q

xTiB   1 1    0  2  1/2  x  1/2  Q

xFe3B  1 1    1  1 -1  x
''',
    'ilmm': '''
xFeA       1 1    0  4  -1/2  g  1/2  i  -1/2  m  1/2  Q

xTiA       1 1    0  4  -1/2  g  1/2  i  -1/2  m  -1/2  Q

xMgA       1 1    0  1  1  g

xMnA       1 1    0  1  1  m

xFe3A      1 1    1  1  -1  i

xFeB       1 1    0  4  -1/2  g  1/2  i  -1/2  m  -1/2  Q

xTiB       1 1    0  4  1/2  g  1/2  i  1/2  m  1/2  Q

xFe3B      1 1    1  1  -1  i
''',
    'sp': '''
x(Al)       1 1    0  1  1  y

x(Fe3)      1 1    1  2 -1  y -1  z

x(Ti)       1 1    0  1  1  z

x(Mg)       1 1    1  1 -1  x

x(Fe2)      1 1    0  1  1  x
''',
    'mt1': '''
xTiM   1 1   1/2   1 -1/2  x
xFe3M  1 1    0    2   1   x -1/2 Q
xFeM   1 1   1/2   2 -1/2  x  1/2 Q
xFe3T  1 1    0    1   1   Q
xFeT   1 1    1    1  -1   Q
''',
    'sa': '''
xMgM3      3 1    1  4  -1  f  -1  x  -1  y  3/4  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  1  x    0  1  1  y

xFeM3      3 1    0  2   1  x  -3/4  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  x    0  1  1  y

xFe3M3     1 1    0  1  1  f

xAlM3      1 1    0  1  1  y

xMgM456    1 1    1  2  -1/4  Q  -1  x

xFeM456    1 1    0  2  1/4  Q   1  x

xSiT       1 1    1  2  -1  f  -1  y

xAlT       1 1    0  2   1  f   1  y
''',
    'plc': '''
x(K)     1 1    0 1  1 k
x(Na)    1 1    1 2 -1 k -1 ca
x(Ca)    1 1    0 1  1 ca
''',
    'ksp': '''
xK         1 1    1  2  -1  ca  -1  na

xNa        1 1    0  1  1  na

xCa        1 1    0  1  1  ca
''',
  },
  'metabasite': {
    'ol': '''
xMgM    1 1      1  1 -1  x

xFeM    1 1      0  1  1  x
''',
    'hb': '''
xvA        1 1    1  1  -1  a

xNaA       2 1    0  1   1  a
             2    0  1  -1  a    0  1  1  k

xKA        1 2    0  1  1  a    0  1  1  k

xMgM13     1 1    1  2   1  Q1  -1  x

xFeM13     1 1    0  2  -1  Q1   1  x

xMgM2      7 1    1  5  -1  f   1  Q2  -1  t  -1  x  -1  y
             2    0  1  -1  f    0  1  1  Q2
             2    0  1  -1  Q2    0  1  1  t
             2    0  1  1  f    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  -1  Q2    0  1  1  y
             2    0  1  1  x    0  1  1  y

xFeM2      7 1    0  2  -1  Q2   1  x
             2    0  1  1  f    0  1  1  Q2
             2    0  1  1  Q2    0  1  1  t
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  1  Q2    0  1  1  y
             2    0  1  -1  x    0  1  1  y

xAlM2      1 1    0  1  1  y

xFe3M2     1 1    0  1  1  f

xTiM2      1 1    0  1  1  t

xCaM4      1 1    0  1  1  c

xMgM4      6 1    1  5  -1  c  -1  Q2  -1  x  -1  z  -3/2  Q1
             2    0  1  1  f    0  1  1  Q2
             2    0  1  1  Q2    0  1  1  t
             2    0  1  1  c    0  1  1  x
             2    0  1  1  Q2    0  1  1  y
             2    0  1  1  x    0  1  1  z

xFeM4      6 1    0  3   1  Q2   1  x  3/2  Q1
             2    0  1  -1  f    0  1  1  Q2
             2    0  1  -1  Q2    0  1  1  t
             2    0  1  -1  c    0  1  1  x
             2    0  1  -1  Q2    0  1  1  y
             2    0  1  -1  x    0  1  1  z

xNaM4      1 1    0  1  1  z

xSiT1      1 1    1  5  -1/2  f  -1/2  t  -1/2  y  1/2  z  -1/4  a

xAlT1      1 1    0  5  1/2  f  1/2  t  1/2  y  -1/2  z  1/4  a

xOHV       1 1    1  1  -1  t

xOV        1 1    0  1  1  t
''',
    'aug': '''
xMgM1      5 1    1  4  1/2  Qfm  -1  j  -1  x  -1  y
             2    0  1  -1/2  j    0  1  1  Qfm
             2    0  1  1  j    0  1  1  x
             2    0  1  1  x    0  1  1  y
             2    0  1  -1/2  Qfm    0  1  1  z

xFeM1      5 1    0  2  -1/2  Qfm   1  x
             2    0  1  1/2  j    0  1  1  Qfm
             2    0  1  -1  j    0  1  1  x
             2    0  1  -1  x    0  1  1  y
             2    0  1  1/2  Qfm    0  1  1  z

xAlM1      1 1    0  3  -1  f   1  j   1  y

xFe3M1     1 1    0  1  1  f

xMgM2      5 1    1  4  -1/2  Qfm  -1  j  -1  x  -1  z
             2    0  1  1/2  j    0  1  1  Qfm
             2    0  1  1  j    0  1  1  x
             2    0  1  1/2  Qfm    0  1  1  z
             2    0  1  1  x    0  1  1  z

xFeM2      5 1    0  2  1/2  Qfm   1  x
             2    0  1  -1/2  j    0  1  1  Qfm
             2    0  1  -1  j    0  1  1  x
             2    0  1  -1/2  Qfm    0  1  1  z
             2    0  1  -1  x    0  1  1  z

xCaM2      1 1    0  1  1  z

xNaM2      1 1    0  1  1  j

xSiT1      1 1    1  2  1/2  Qal  -1/2  y

xAlT1      1 1    0  2  -1/2  Qal  1/2  y

xSiT2      1 1    1  2  -1/2  Qal  -1/2  y

xAlT2      1 1    0  2  1/2  Qal  1/2  y
''',
    'dio': '''
xMgM1m     5 1    1  4  -1  j   1  Q   1  Qfm  -1  x
             2    0  1  -1  j    0  1  1  Qfm
             2    0  1  -1  Q    0  1  1  Qfm
             2    0  1  1  j    0  1  1  x
             2    0  1  -1  Q    0  1  1  x

xFeM1m     5 1    0  2  -1  Qfm   1  x
             2    0  1  1  j    0  1  1  Qfm
             2    0  1  1  Q    0  1  1  Qfm
             2    0  1  -1  j    0  1  1  x
             2    0  1  1  Q    0  1  1  x

xFe3M1m    2 1    0  1  -1  Qaf
             2    0  1  1  f    0  1  1  j

xAlM1m     2 1    0  3   1  j  -1  Q   1  Qaf
             2    0  1  -1  f    0  1  1  j

xMgM1a     5 1    1  4  -1  j  -1  Q  -1  Qfm  -1  x
             2    0  1  1  j    0  1  1  Qfm
             2    0  1  1  Q    0  1  1  Qfm
             2    0  1  1  j    0  1  1  x
             2    0  1  1  Q    0  1  1  x

xFeM1a     5 1    0  2   1  Qfm   1  x
             2    0  1  -1  j    0  1  1  Qfm
             2    0  1  -1  Q    0  1  1  Qfm
             2    0  1  -1  j    0  1  1  x
             2    0  1  -1  Q    0  1  1  x

xFe3M1a    2 1    0  1   1  Qaf
             2    0  1  1  f    0  1  1  j

xAlM1a     2 1    0  3   1  j   1  Q  -1  Qaf
             2    0  1  -1  f    0  1  1  j

xNaM2c     1 1    0  2   1  j  -1  Q

xCaM2c     1 1    1  2  -1  j   1  Q

xNaM2n     1 1    0  2   1  j   1  Q

xCaM2n     1 1    1  2  -1  j  -1  Q
''',
    'abc': '''
xNaA       1 1    1  1  -1  ca
xCaA       1 1    0  1  1  ca
''',
    'pli': '''
xK     1 1    0 1  1 k
xNa    1 1    1 2 -1 k -1 ca
xCa    1 1    0 1  1 ca
''',
    'g': '''
xMgX       2 1    1  2  -1  x  -1  z
             2    0  1  1  x    0  1  1  z

xFeX       2 1    0  1   1  x
             2    0  1  -1  x    0  1  1  z

xCaX       1 1    0  1  1  z

xAlY       1 1    1  1  -1  f

xFe3Y      1 1    0  1  1  f
''',
    'bi': '''
xMgM3      4 1    1  5  -1  f  -1  t  -1  x  -1  y  -2/3  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  1  x    0  1  1  y

xFeM3      4 1    0  2   1  x  2/3  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  -1  x    0  1  1  y

xFe3M3     1 1    0  1  1  f

xTiM3      1 1    0  1  1  t

xAlM3      1 1    0  1  1  y

xMgM12     1 1    1  2  1/3  Q  -1  x

xFeM12     1 1    0  2  -1/3  Q   1  x

xSiT       1 1    1/2  2  -1/2  f  -1/2  y

xAlT       1 1    1/2  2  1/2  f  1/2  y
''',
    'chl': '''
xMgM1      5 1    1  4   1  Q1   1  QAl  -1  x  -1  y
             2    0  1  1  Q1    0  1  1  QAl
             2    0  1  -1  QAl    0  1  1  x
             2    0  1  -1  Q1    0  1  1  y
             2    0  1  1  x    0  1  1  y

xFeM1      5 1    0  2  -1  Q1   1  x
             2    0  1  -1  Q1    0  1  1  QAl
             2    0  1  1  QAl    0  1  1  x
             2    0  1  1  Q1    0  1  1  y
             2    0  1  -1  x    0  1  1  y

xAlM1      1 1    0  2  -1  QAl   1  y

xMgM23     6 1    1  3  -1/4  Q1  -1/4  Q4  -1  x
             2    0  1  1/4  f    0  1  1  Q4
             2    0  1  -1/4  Q1    0  1  1  QAl
             2    0  1  1/4  Q4    0  1  1  QAl
             2    0  1  1/4  Q1    0  1  1  y
             2    0  1  1/4  Q4    0  1  1  y

xFeM23     6 1    0  3  1/4  Q1  1/4  Q4   1  x
             2    0  1  -1/4  f    0  1  1  Q4
             2    0  1  1/4  Q1    0  1  1  QAl
             2    0  1  -1/4  Q4    0  1  1  QAl
             2    0  1  -1/4  Q1    0  1  1  y
             2    0  1  -1/4  Q4    0  1  1  y

xMgM4      7 1    1  5  -1  f   1  Q4  -1  QAl  -1  x  -1  y
             2    0  1  -1  f    0  1  1  Q4
             2    0  1  -1  Q4    0  1  1  QAl
             2    0  1  1  f    0  1  1  x
             2    0  1  1  QAl    0  1  1  x
             2    0  1  -1  Q4    0  1  1  y
             2    0  1  1  x    0  1  1  y

xFeM4      7 1    0  2  -1  Q4   1  x
             2    0  1  1  f    0  1  1  Q4
             2    0  1  1  Q4    0  1  1  QAl
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  QAl    0  1  1  x
             2    0  1  1  Q4    0  1  1  y
             2    0  1  -1  x    0  1  1  y

xFe3M4     1 1    0  1  1  f

xAlM4      1 1    0  2   1  QAl   1  y

xSiT2      1 1    1  2  -1/2  f  -1  y

xAlT2      1 1    0  2  1/2  f   1  y
''',
    'opx': '''
xMgM1      4 1    1  4  1/2  Q  -1  f  -1  x  -1  y
             2    0  1  -1/2  c    0  1  1  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  1  x    0  1  1  y

xFeM1      4 1    0  2  -1/2  Q   1  x
             2    0  1  1/2  c    0  1  1  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  x    0  1  1  y

xFe3M1     1 1    0  1  1  f

xAlM1      1 1    0  1  1  y

xMgM2      3 1    1  3  -1/2  Q  -1  c  -1  x
             2    0  1  1/2  c    0  1  1  Q
             2    0  1  1  c    0  1  1  x

xFeM2      3 1    0  2  1/2  Q   1  x
             2    0  1  -1/2  c    0  1  1  Q
             2    0  1  -1  c    0  1  1  x

xCaM2      1 1    0  1  1  c

xAlT       1 1    0  2  1/2  f  1/2  y

xSiT       1 1    1  2  -1/2  f  -1/2  y
''',
    'ilmm': '''
xFeA       1 1    0  3  -1/2  g  1/2  i  1/2  Q

xTiA       1 1    0  3  -1/2  g  1/2  i  -1/2  Q

xMgA       1 1    0  1  1  g

xFe3A      1 1    1  1  -1  i

xFeB       1 1    0  3  -1/2  g  1/2  i  -1/2  Q

xTiB       1 1    0  3  1/2  g  1/2  i  1/2  Q

xFe3B      1 1    1  1  -1  i
''',
    'mu': '''
xKA        1 1    1  2  -1  c  -1  n

xNaA       1 1    0  1  1  n

xCaA       1 1    0  1  1  c

xMgM2A     2 1    1  2  -1  x  -1  y
             2    0  1  1  x    0  1  1  y

xFeM2A     2 1    0  1   1  x
             2    0  1  -1  x    0  1  1  y

xAlM2A     1 1    0  1  1  y

xAlM2B     1 1    1  1  -1  f

xFe3M2B    1 1    0  1  1  f

xSiT1      1 1    1  2  -1/2  c  -1/2  y

xAlT1      1 1    0  2  1/2  c  1/2  y
''',
  },
  'igneous': {
    'g_W24': '''
xMgM1      2 1    1  2  -1  c  -1  x
             2    0  1  1  c    0  1  1  x

xFeM1      2 1    0  1   1  x
             2    0  1  -1  c    0  1  1  x

xCaM1      1 1    0  1  1  c

xAlM2      1 1    1  3  -1  cr  -1  f  -2  t

xCrM2      1 1    0  1  1  cr

xFe3M2     1 1    0  1  1  f

xMgM2      1 1    0  1  1  t

xTiM2      1 1    0  1  1  t
''',
    'ol_H18': '''
xMgM1      1 1    1  2   1  Q  -1  x

xFeM1      1 1    0  2  -1  Q   1  x

xMgM2      2 1    1  3  -1  c  -1  Q  -1  x
             2    0  1  1  c    0  1  1  x

xFeM2      2 1    0  2   1  Q   1  x
             2    0  1  -1  c    0  1  1  x

xCaM2      1 1    0  1  1  c
''',
    'cd_G25': '''
xFeX       1 1    0  1  1  x

xMgX       1 1    1  1  -1  x

xH2OH      1 1    0  1  1  h

xvH        1 1    1  1  -1  h
''',
    'ilm_W24': '''
xFeA       2 1    0  2  1/2  i  1/2  Q
             2    0  1  -1/2  i    0  1  1  m

xTiA       1 1    0  2  1/2  i  -1/2  Qt

xFe3A      1 1    1  1  -1  i

xMgA       2 1    0  2  -1/2  Q  1/2  Qt
             2    0  1  1/2  i    0  1  1  m

xFeB       2 1    0  2  1/2  i  -1/2  Q
             2    0  1  -1/2  i    0  1  1  m

xTiB       1 1    0  2  1/2  i  1/2  Qt

xFe3B      1 1    1  1  -1  i

xMgB       2 1    0  2  1/2  Q  -1/2  Qt
             2    0  1  1/2  i    0  1  1  m
''',
    'bi_G25': '''
xMgM3      4 1    1  5  -1  f  -1  t  -1  x  -1  y  -2/3  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  1  x    0  1  1  y

xFeM3      4 1    0  2   1  x  2/3  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  -1  x    0  1  1  y

xFe3M3     1 1    0  1  1  f

xTiM3      1 1    0  1  1  t

xAlM3      1 1    0  1  1  y

xMgM12     1 1    1  2  1/3  Q  -1  x

xFeM12     1 1    0  2  -1/3  Q   1  x

xSiT       1 1    1/2  2  -1/2  f  -1/2  y

xAlT       1 1    1/2  2  1/2  f  1/2  y
''',
    'opx_W24': '''
xMgM1      7 1    1  5  -1  j  -1  Q   1  t  -1  x  -1  y
             2    0  1  1  j    0  1  1  Q
             2    0  1  -1  Q    0  1  1  t
             2    0  1  1  j    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  1  Q    0  1  1  y
             2    0  1  1  x    0  1  1  y

xFeM1      7 1    0  2   1  Q   1  x
             2    0  1  -1  j    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  -1  j    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  -1  Q    0  1  1  y
             2    0  1  -1  x    0  1  1  y

xAlM1      1 1    0  5  -1  cr  -1  f   1  j   1  y  -2  t

xFe3M1     1 1    0  1  1  f

xCrM1      1 1    0  1  1  cr

xTiM1      1 1    0  1  1  t

xMgM2      6 1    1  4  -1  c  -1  j   1  Q  -1  x
             2    0  1  -1  j    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  1  c    0  1  1  x
             2    0  1  1  j    0  1  1  x
             2    0  1  -1  Q    0  1  1  y

xFeM2      6 1    0  2  -1  Q   1  x
             2    0  1  1  j    0  1  1  Q
             2    0  1  -1  Q    0  1  1  t
             2    0  1  -1  c    0  1  1  x
             2    0  1  -1  j    0  1  1  x
             2    0  1  1  Q    0  1  1  y

xCaM2      1 1    0  1  1  c

xNaM2      1 1    0  1  1  j

xSiT       1 1    1  1  -1/2  y

xAlT       1 1    0  1  1/2  y
''',
    'cpx_W24': '''
xMgM1      9 1    1  6  -1  k  -1  n  -1  Q   1  t  -1  x  -1  y
             2    0  1  1  k    0  1  1  Q
             2    0  1  1  n    0  1  1  Q
             2    0  1  -1  Q    0  1  1  t
             2    0  1  1  k    0  1  1  x
             2    0  1  1  n    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  1  Q    0  1  1  y
             2    0  1  1  x    0  1  1  y

xFeM1      9 1    0  2   1  Q   1  x
             2    0  1  -1  k    0  1  1  Q
             2    0  1  -1  n    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  -1  k    0  1  1  x
             2    0  1  -1  n    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  -1  Q    0  1  1  y
             2    0  1  -1  x    0  1  1  y

xAlM1      1 1    0  6  -1  cr  -1  f   1  k   1  n   1  y  -2  t

xFe3M1     1 1    0  1  1  f

xCrM1      1 1    0  1  1  cr

xTiM1      1 1    0  1  1  t

xMgM2      6 1    0  2   1  o   1  Q
             2    0  1  -1  k    0  1  1  Q
             2    0  1  -1  n    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  -1  o    0  1  1  x
             2    0  1  -1  Q    0  1  1  y

xFeM2      6 1    0  1  -1  Q
             2    0  1  1  k    0  1  1  Q
             2    0  1  1  n    0  1  1  Q
             2    0  1  -1  Q    0  1  1  t
             2    0  1  1  o    0  1  1  x
             2    0  1  1  Q    0  1  1  y

xCaM2      1 1    1  3  -1  k  -1  n  -1  o

xNaM2      1 1    0  1  1  n

xKM2       1 1    0  1  1  k

xSiT       1 1    1  1  -1/2  y

xAlT       1 1    0  1  1/2  y
''',
    'spl_T21': '''
xMgT       2 1    1/3  3  1/3  t  -1/3  x  2/3  Q1
             2    0  1  -1/3  t    0  1  1  x

xFeT       2 1    0  2  1/3  x  2/3  Q2
             2    0  1  1/3  t    0  1  1  x

xAlT       3 1    2/3  5  -1/3  t  -2/3  Q1  -2/3  Q2  -2/3  Q3  -2/3  y
             2    0  1  2/3  c    0  1  1  y
             2    0  1  2/3  t    0  1  1  y

xFe3T      3 1    0  2  2/3  Q3  2/3  y
             2    0  1  -2/3  c    0  1  1  y
             2    0  1  -2/3  t    0  1  1  y

xMgM       2 1    1/3  3  -1/3  Q1  1/3  t  -1/3  x
             2    0  1  -1/3  t    0  1  1  x

xFeM       2 1    0  2  -1/3  Q2  1/3  x
             2    0  1  1/3  t    0  1  1  x

xAlM       3 1    2/3  6  1/3  Q1  1/3  Q2  1/3  Q3  -1  c  -2/3  y  -5/6  t
             2    0  1  2/3  c    0  1  1  y
             2    0  1  2/3  t    0  1  1  y

xFe3M      3 1    0  2  -1/3  Q3  2/3  y
             2    0  1  -2/3  c    0  1  1  y
             2    0  1  -2/3  t    0  1  1  y

xCrM       1 1    0  1  1  c

xTiM       1 1    0  1  1/2  t
''',
    'ep': '''
xFeM1   1  1    0  2  1  f  -1  Q
xAlM1   1  1    1  2 -1  f   1  Q
xFeM3   1  1    0  2  1  f   1  Q
xAlM3   1  1    1  2 -1  f  -1  Q
''',
    'mu': '''
xKA        1 1    1  2  -1  c  -1  n

xNaA       1 1    0  1  1  n

xCaA       1 1    0  1  1  c

xMgM2A     2 1    1  2  -1  x  -1  y
             2    0  1  1  x    0  1  1  y

xFeM2A     2 1    0  1   1  x
             2    0  1  -1  x    0  1  1  y

xAlM2A     1 1    0  1  1  y

xAlM2B     1 1    1  1  -1  f

xFe3M2B    1 1    0  1  1  f

xSiT1      1 1    1  2  -1/2  c  -1/2  y

xAlT1      1 1    0  2  1/2  c  1/2  y
''',
    'pl4tr': '''
xNaA       1 1    1  2  -1  ca  -1  k
xCaA       1 1    0  1  1  ca
xKA        1 1    0  1  1  k
xAlTB      1 1    1/4  1  1/4  ca
xSiTB      1 1    3/4  1  -1/4  ca
''',
    'hb': '''
xvA        1 1    1  1  -1  a

xNaA       2 1    0  1   1  a
             2    0  1  -1  a    0  1  1  k

xKA        1 2    0  1  1  a    0  1  1  k

xMgM13     1 1    1  2   1  Q1  -1  x

xFeM13     1 1    0  2  -1  Q1   1  x

xMgM2      7 1    1  5  -1  f   1  Q2  -1  t  -1  x  -1  y
             2    0  1  -1  f    0  1  1  Q2
             2    0  1  -1  Q2    0  1  1  t
             2    0  1  1  f    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  -1  Q2    0  1  1  y
             2    0  1  1  x    0  1  1  y

xFeM2      7 1    0  2  -1  Q2   1  x
             2    0  1  1  f    0  1  1  Q2
             2    0  1  1  Q2    0  1  1  t
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  1  Q2    0  1  1  y
             2    0  1  -1  x    0  1  1  y

xAlM2      1 1    0  1  1  y

xFe3M2     1 1    0  1  1  f

xTiM2      1 1    0  1  1  t

xCaM4      1 1    0  1  1  c

xMgM4      6 1    1  5  -1  c  -1  Q2  -1  x  -1  z  -3/2  Q1
             2    0  1  1  f    0  1  1  Q2
             2    0  1  1  Q2    0  1  1  t
             2    0  1  1  c    0  1  1  x
             2    0  1  1  Q2    0  1  1  y
             2    0  1  1  x    0  1  1  z

xFeM4      6 1    0  3   1  Q2   1  x  3/2  Q1
             2    0  1  -1  f    0  1  1  Q2
             2    0  1  -1  Q2    0  1  1  t
             2    0  1  -1  c    0  1  1  x
             2    0  1  -1  Q2    0  1  1  y
             2    0  1  -1  x    0  1  1  z

xNaM4      1 1    0  1  1  z

xSiT1      1 1    1  5  -1/2  f  -1/2  t  -1/2  y  1/2  z  -1/4  a

xAlT1      1 1    0  5  1/2  f  1/2  t  1/2  y  -1/2  z  1/4  a

xOHV       1 1    1  1  -1  t

xOV        1 1    0  1  1  t
''',
  },
}
