"""Ground-truth extractor for the reference's example_v{1..6}.sigmf golden
files. Mirrors /root/reference/src/sea_ingest/seamf.py loader semantics
(select_loader:927-978, _Loader_v1..v5) using only stdlib+numpy, and prints a
JSON of facts to pin in SeamfGoldenSpec.scala. Dev tool only — not part of
the engine."""
import json, glob, lzma, hashlib, tarfile, sys
import numpy as np

def trace_index_normalize(labels):
    # seamf.py:118-127 _trace_index: detector max->peak, mean->rms;
    # statistic maximum->max, minimum->min (applies to ALL tables)
    out = []
    for (stat, det) in labels:
        det = {"max": "peak", "mean": "rms"}.get(det, det)
        stat = {"maximum": "max", "minimum": "min"}.get(stat, stat)
        out.append((stat, det))
    return out

def load(path):
    with tarfile.open(path) as tar:
        names = tar.getnames()
        meta_name = [n for n in names if n.endswith('.sigmf-meta')][0]
        data_name = [n for n in names if n.endswith('.sigmf-data')][0]
        json_bytes = tar.extractfile(meta_name).read()
        lzma_data = tar.extractfile(data_name).read()
    j = json.loads(json_bytes)
    g = j['global']
    ext = g['core:extensions']
    if isinstance(ext, list):
        version = [e['version'] for e in ext if e['name'] == 'ntia-nasctn-sea'][0]
    else:
        version = ext.get('ntia-nasctn-sea', None)
    gen = {None: 1, 'v0.2': 2, 'v0.3': 3, 'v0.4': 4, 'v0.4.0': 5,
           'v0.6.0': 6, '0.6.0': 6}[version]
    sha_ok = hashlib.sha512(lzma_data).hexdigest() == g['core:sha512']
    data = np.frombuffer(lzma.decompress(lzma_data, format=lzma.FORMAT_XZ), dtype='half')
    caps = j['captures']
    sample_rate = g['core:sample_rate']
    fact = dict(file=path.split('/')[-1], gen=gen, version=version,
                sha512_ok=sha_ok, n_captures=len(caps),
                total_halfs=len(data), sample_rate=sample_rate,
                frequencies=[c['core:frequency'] for c in caps],
                first_datetime=caps[0]['core:datetime'])
    geo = g.get('core:geolocation', {}).get('coordinates')
    fact['geolocation'] = geo
    # timezone_at bands, seamf.py:37-46
    tz = None
    if geo:
        lng = geo[0]
        if -119 < lng < -116: tz = 'America/Los_Angeles'
        elif -116 < lng < -80: tz = 'America/Denver'
        elif -80 < lng < 60: tz = 'America/Boston'
    fact['timezone'] = tz

    # --- per-version trace layout: list of (offset_in_capture | absolute, table, stat, det, length)
    # plus per-capture absolute trace starts
    trace_starts = {}  # absolute offset -> (table, stat, det)
    if gen == 1:
        for a in j.get('annotations', []):
            t = a.get('ntia-core:annotation_type')
            if t == 'FrequencyDomainDetection':
                label = 'psd_' + a['ntia-algorithm:detector'][4:]
            elif t == 'TimeDomainDetection':
                label = 'pvt_' + a['ntia-algorithm:detector']
            elif t in ('CalibrationAnnotation', 'SensorAnnotation'):
                continue
            else:
                label = a.get('core:label')
            TRACE_INFO = {
                'psd_max_power': ('psd', 'max', ''), 'psd_mean_power': ('psd', 'mean', ''),
                'pvt_max_power': ('pvt', '', 'peak'), 'pvt_mean_power': ('pvt', '', 'rms'),
                'apd_p_pct': ('apd_p', '', ''), 'apd_a_dBm': ('apd_a', '', ''),
            }
            for det in ('rms', 'peak'):
                for st in ('min', 'max', 'mean'):
                    TRACE_INFO[f'pfp_{det}_{st}_power'] = ('pfp', st, det)
            trace_starts[a['core:sample_start']] = TRACE_INFO[label] + (a['core:sample_count'],)
        # v1 axes: psd (0, 10e6/count); pvt (0, nsamples/srate/count); pfp (0, 4.0/560/400)
    elif gen == 2:
        TRACE_INFO = {
            'max_fft': ('psd', 'max', ''), 'mean_fft': ('psd', 'mean', ''),
            'max_td_pwr_series': ('pvt', '', 'peak'), 'mean_td_pwr_series': ('pvt', '', 'rms'),
            'apd_p': ('apd_p', '', ''), 'apd_a': ('apd_a', '', ''),
        }
        for det in ('rms', 'peak'):
            for st in ('min', 'max', 'mean'):
                TRACE_INFO[f'{st}_{det}_pfp'] = ('pfp', st, det)
        counts = caps[-1]
        for c in caps:
            for k, v in c.items():
                if k.endswith('sample_start') and not k.startswith('core:'):
                    name = k.rsplit('_sample_start', 1)[0]
                    tab, st, det = TRACE_INFO[name]
                    n = {'psd': c['fft_sample_count'], 'pvt': c['td_pwr_sample_count'],
                         'pfp': c['pfp_sample_count'], 'apd_p': c['apd_sample_count'],
                         'apd_a': c['apd_sample_count']}[tab]
                    trace_starts[v] = (tab, st, det, n)
    elif gen == 3:
        dp = g['data_products']
        groups = [('psd', 'power_spectral_density'), ('pvt', 'time_series_power'),
                  ('pfp', 'periodic_frame_power')]
        offs, labels = [], []
        off = 0
        for short, name in groups:
            fld = dp[name]
            for dname in fld['detector']:
                offs.append(off)
                split = dname.split('_')
                if short == 'pvt': lab = (short, '', {'max': 'peak', 'mean': 'rms'}[split[0]])
                elif short == 'psd': lab = (short, split[0], '')
                else: lab = (short, split[1], split[0])
                labels.append(lab)
                off += fld['sample_count']
        apd_start = offs[-1] + (offs[-1] - offs[-2])
        apd_counts = dp['amplitude_probability_distribution']['sample_count']
        for c, apd_n in zip(caps, apd_counts):
            s = c['core:sample_start']
            for o, lab in zip(offs, labels):
                n = offs[1] - offs[0] if False else None
                trace_starts[s + o] = lab + (dp[ [g2 for s2,g2 in groups if s2==lab[0]][0] ]['sample_count'],)
            trace_starts[s + apd_start] = ('apd_p', '', '', apd_n)
            trace_starts[s + apd_start + apd_n] = ('apd_a', '', '', None)  # runs to next capture
    else:
        dp = g['ntia-algorithm:data_products']
        offs, labels, lens = [], [], []
        off = 0
        if isinstance(dp, dict):  # v4
            groups = [('psd', 'power_spectral_density'), ('pvt', 'time_series_power'),
                      ('pfp', 'periodic_frame_power'), ('apd', 'amplitude_probability_distribution')]
            for short, name in groups:
                fld = dp[name]
                trs = fld.get('traces', [None])
                for tr in trs:
                    offs.append(off)
                    if tr is None: lab = (short, '', '')
                    else: lab = (short, tr.get('statistic', ''), tr.get('detector', ''))
                    labels.append(lab); lens.append(fld['length'])
                    off += fld['length']
        else:  # v5/v6 graphs
            NAME = {'Power Spectral Density': 'psd', 'Power vs. Time': 'pvt',
                    'Periodic Frame Power': 'pfp', 'Amplitude Probability Distribution': 'apd'}
            for gr in dp:
                short = NAME[gr['name']]
                if short == 'apd':
                    offs.append(off); labels.append((short, '', '')); lens.append(gr['length'])
                    off += gr['length']
                else:
                    for sname in gr['series']:
                        offs.append(off)
                        if short == 'pfp': lab = (short, sname.split('_')[1], sname.split('_')[0])
                        elif short == 'psd': lab = (short, sname, '')
                        else: lab = (short, '', sname)
                        labels.append(lab); lens.append(gr['length'])
                        off += gr['length']
        for c in caps:
            s = c['core:sample_start']
            for o, lab, n in zip(offs, labels, lens):
                trace_starts[s + o] = lab + (n,)

    # normalize labels as _trace_index does
    norm = {}
    for off, (tab, st, det, n) in sorted(trace_starts.items()):
        det2 = {'max': 'peak', 'mean': 'rms'}.get(det, det)
        st2 = {'maximum': 'max', 'minimum': 'min'}.get(st, st)
        norm[off] = (tab, st2, det2, n)

    # split: traces bounded by next offset (or end)
    offsets = sorted(norm.keys())
    bounds = offsets[1:] + [len(data)]
    tables = {}
    for (o, e) in zip(offsets, bounds):
        tab, st, det, n = norm[o]
        arr = data[o:e]
        if n is not None and len(arr) != n and tab not in ('apd_a',):
            print(f'WARN len mismatch {tab} {st} {det}: {len(arr)} != {n}', file=sys.stderr)
        tables.setdefault(tab, []).append((o, st, det, arr))

    emitted = ['psd', 'pvt', 'pfp'] + (['apd'] if gen >= 4 else [])
    fact['tables'] = {}
    for tab in emitted:
        rows = tables.get(tab, [])
        labels_set = sorted(set((st, det) for (_, st, det, _) in rows))
        fact['tables'][tab] = dict(
            n_traces=len(rows), trace_len=len(rows[0][3]) if rows else 0,
            labels=labels_set)
    # psd pinned values: first capture's 'max' psd trace, first 3 values as f64
    psd_rows = [r for r in tables.get('psd', []) if r[1] == 'max']
    psd_first = sorted(psd_rows, key=lambda r: r[0])[0]
    fact['psd_max_first3'] = [float(x) for x in psd_first[3][:3]]
    fact['psd_max_trace_max'] = float(np.max(psd_first[3]))
    # declared vs recomputed channel powers (v4+)
    decl = g.get('ntia-nasctn-sea:max_of_max_channel_powers')
    if decl:
        rec = [float(np.max(arr)) for (_, st, det, arr) in
               sorted(tables['psd'], key=lambda r: r[0]) if st == 'max']
        # recompute from pvt peak traces instead (channel power, not psd)
        rec_pvt = [float(np.max(arr)) for (_, st, det, arr) in
                   sorted(tables['pvt'], key=lambda r: r[0]) if det == 'peak']
        fact['declared_max_of_max'] = decl
        fact['recomputed_pvt_peak_max'] = rec_pvt
    print(json.dumps(fact))

for v in range(1, 7):
    load(glob.glob(f'/root/reference/demos/data/example_v{v}.sigmf')[0])
