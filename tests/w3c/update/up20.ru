PREFIX ex: <http://ex/>
INSERT { ?s ex:from ?g } USING NAMED ex:g1 WHERE { GRAPH ?g { ?s ex:v ?n } }
