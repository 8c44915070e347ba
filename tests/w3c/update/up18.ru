PREFIX ex: <http://ex/>
INSERT { ?s ex:copied ?n } USING ex:g1 WHERE { ?s ex:v ?n }
