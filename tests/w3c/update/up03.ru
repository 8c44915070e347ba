PREFIX ex: <http://ex/>
INSERT { ?s ex:label ?n } WHERE { ?s ex:name ?n }
