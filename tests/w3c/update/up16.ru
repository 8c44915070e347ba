PREFIX ex: <http://ex/>
INSERT { GRAPH ex:g3 { ?s ex:label ?n } } WHERE { ?s ex:name ?n }
